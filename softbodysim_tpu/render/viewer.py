"""Playable animation export: one self-contained HTML file, zero deps.

The reference's L8 is a live Unity viewport (SoftBodyGpuRenderLit.shader);
the headless TPU analog needs a user-visible artifact, so rollouts export to
a single .html with the frame buffers embedded (base64 Float32Array) and a
~100-line WebGL2 renderer: orbit camera, play/pause/scrub, flat shading from
fragment derivatives (no per-frame normal upload -- the GPU derives normals,
like the reference's K_UpdateNormals stage but free).

Multi-body scenes concatenate their surface meshes into one buffer.
"""

from __future__ import annotations

import base64
import json
from typing import Optional, Sequence

import numpy as np

_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title><style>
 body{{margin:0;background:#10131a;color:#dde;font:13px system-ui}}
 #hud{{position:fixed;left:10px;top:10px;user-select:none}}
 #bar{{position:fixed;left:10px;bottom:10px;right:10px;display:flex;gap:8px;align-items:center}}
 input[type=range]{{flex:1}} button{{background:#2a3140;color:#dde;border:0;padding:4px 12px;border-radius:4px}}
 canvas{{display:block;width:100vw;height:100vh}}</style></head><body>
<canvas id="c"></canvas>
<div id="hud">{title} &mdash; {nv} verts, {nf} frames @ {fps} fps &mdash; drag to orbit, wheel to zoom</div>
<div id="bar"><button id="play">pause</button><input id="seek" type="range" min="0" max="{nfm1}" value="0"><span id="fr">0</span></div>
<script>
const NV={nv},NF={nf},FPS={fps};
function decode(b64){{const s=atob(b64);const a=new Uint8Array(s.length);
 for(let i=0;i<s.length;i++)a[i]=s.charCodeAt(i);return a.buffer;}}
const pos=new Float32Array(decode("{pos_b64}"));
const idx=new Uint32Array(decode("{idx_b64}"));
const cv=document.getElementById("c"),gl=cv.getContext("webgl2");
const vs=`#version 300 es
 in vec3 p;uniform mat4 mvp;out vec3 wp;
 void main(){{wp=p;gl_Position=mvp*vec4(p,1.0);}}`;
const fs=`#version 300 es
 precision highp float;in vec3 wp;out vec4 o;
 void main(){{vec3 n=normalize(cross(dFdx(wp),dFdy(wp)));
  float d=max(dot(n,normalize(vec3(.4,.8,.5))),0.0);
  vec3 base=vec3(.35,.55,.9);
  o=vec4(base*(0.25+0.75*d)+vec3(pow(d,24.0)*.3),1.0);}}`;
function sh(t,s){{const h=gl.createShader(t);gl.shaderSource(h,s);gl.compileShader(h);
 if(!gl.getShaderParameter(h,gl.COMPILE_STATUS))throw gl.getShaderInfoLog(h);return h;}}
const pr=gl.createProgram();gl.attachShader(pr,sh(gl.VERTEX_SHADER,vs));
gl.attachShader(pr,sh(gl.FRAGMENT_SHADER,fs));gl.linkProgram(pr);gl.useProgram(pr);
const vb=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,vb);
gl.bufferData(gl.ARRAY_BUFFER,NV*12,gl.DYNAMIC_DRAW);
const loc=gl.getAttribLocation(pr,"p");gl.enableVertexAttribArray(loc);
gl.vertexAttribPointer(loc,3,gl.FLOAT,false,0,0);
const ib=gl.createBuffer();gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER,ib);
gl.bufferData(gl.ELEMENT_ARRAY_BUFFER,idx,gl.STATIC_DRAW);
gl.enable(gl.DEPTH_TEST);
let cx=0,cy=0,cz=0,R=1;{{let lo=[1e9,1e9,1e9],hi=[-1e9,-1e9,-1e9];
 for(let i=0;i<NV;i++)for(let k=0;k<3;k++){{const v=pos[i*3+k];
  if(v<lo[k])lo[k]=v;if(v>hi[k])hi[k]=v;}}
 cx=(lo[0]+hi[0])/2;cy=(lo[1]+hi[1])/2;cz=(lo[2]+hi[2])/2;
 R=Math.max(hi[0]-lo[0],hi[1]-lo[1],hi[2]-lo[2])*1.2+1e-3;}}
let yaw=0.7,pitch=0.35,dist=2.2,drag=false,lx=0,ly=0;
cv.onmousedown=e=>{{drag=true;lx=e.clientX;ly=e.clientY;}};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{{if(!drag)return;yaw+=(e.clientX-lx)*.008;
 pitch=Math.min(1.5,Math.max(-1.5,pitch+(e.clientY-ly)*.008));lx=e.clientX;ly=e.clientY;}};
cv.onwheel=e=>{{dist*=Math.exp(e.deltaY*.001);e.preventDefault();}};
function mat(){{const a=innerWidth/innerHeight,f=1/Math.tan(.4),zn=.01*R,zf=40*R;
 const ex=cx+dist*R*Math.cos(pitch)*Math.sin(yaw),
       ey=cy+dist*R*Math.sin(pitch),
       ez=cz+dist*R*Math.cos(pitch)*Math.cos(yaw);
 let zx=ex-cx,zy=ey-cy,zz=ez-cz;const zl=Math.hypot(zx,zy,zz);zx/=zl;zy/=zl;zz/=zl;
 let xx=zz,xy=0,xz=-zx;const xl=Math.hypot(xx,xy,xz)||1;xx/=xl;xz/=xl;
 const yx=zy*xz-zz*xy,yy=zz*xx-zx*xz,yz=zx*xy-zy*xx;
 const v=[xx,yx,zx,0, xy,yy,zy,0, xz,yz,zz,0,
  -(xx*ex+xy*ey+xz*ez),-(yx*ex+yy*ey+yz*ez),-(zx*ex+zy*ey+zz*ez),1];
 const A=(zf+zn)/(zn-zf),B=2*zf*zn/(zn-zf);
 const p=[f/a,0,0,0, 0,f,0,0, 0,0,A,-1, 0,0,B,0];
 const m=new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){{let s=0;
  for(let k=0;k<4;k++)s+=p[k*4+j]*v[i*4+k];m[i*4+j]=s;}}
 return m;}}
const useek=document.getElementById("seek"),ufr=document.getElementById("fr"),
      ubtn=document.getElementById("play");
let playing=true,t0=performance.now(),frame=0;
ubtn.onclick=()=>{{playing=!playing;ubtn.textContent=playing?"pause":"play";}};
useek.oninput=()=>{{frame=+useek.value;playing=false;ubtn.textContent="play";}};
function draw(now){{
 cv.width=innerWidth*devicePixelRatio;cv.height=innerHeight*devicePixelRatio;
 gl.viewport(0,0,cv.width,cv.height);
 if(playing)frame=Math.floor((now-t0)/1000*FPS)%NF;
 useek.value=frame;ufr.textContent=frame;
 gl.bindBuffer(gl.ARRAY_BUFFER,vb);
 gl.bufferSubData(gl.ARRAY_BUFFER,0,pos.subarray(frame*NV*3,(frame+1)*NV*3));
 gl.clearColor(.063,.075,.10,1);gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
 gl.uniformMatrix4fv(gl.getUniformLocation(pr,"mvp"),false,mat());
 gl.drawElements(gl.TRIANGLES,idx.length,gl.UNSIGNED_INT,0);
 requestAnimationFrame(draw);}}
requestAnimationFrame(draw);
</script></body></html>
"""


def export_html(path: str, frames: np.ndarray, triangles: np.ndarray,
                fps: int = 30, title: str = "softbodysim_tpu rollout"):
    """Write a playable single-file WebGL viewer.

    frames    : (F, V, 3) positions per frame
    triangles : (T, 3) surface indices into V
    """
    frames = np.ascontiguousarray(np.asarray(frames, np.float32))
    tris = np.ascontiguousarray(np.asarray(triangles, np.uint32)).reshape(-1, 3)
    f, v, _ = frames.shape
    html = _HTML.format(
        title=title, nv=v, nf=f, nfm1=max(0, f - 1), fps=int(fps),
        pos_b64=base64.b64encode(frames.tobytes()).decode(),
        idx_b64=base64.b64encode(tris.tobytes()).decode(),
    )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html)
    return path


class AnimationRecorder:
    """Collect per-frame surface positions from one or more bodies and
    export a playable HTML (and optionally an OBJ sequence / npz).

    Bodies are (surface_triangles, get_positions) pairs; multi-body scenes
    concatenate into one draw call like the reference's single manager pass.
    """

    def __init__(self):
        self._tris: list = []
        self._getters: list = []
        self._offsets: list = []
        self._frames: list = []
        self._nv = 0

    def add_body(self, triangles: np.ndarray, positions_fn):
        t = np.asarray(triangles, np.int64).reshape(-1, 3)
        self._tris.append(t + self._nv)
        self._getters.append(positions_fn)
        probe = np.asarray(positions_fn())
        self._offsets.append(self._nv)
        self._nv += len(probe)
        return self

    def capture(self):
        self._frames.append(
            np.concatenate([np.asarray(g(), np.float32)
                            for g in self._getters], axis=0))
        return self

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    def export(self, path: str, fps: int = 30,
               title: str = "softbodysim_tpu rollout",
               obj_dir: Optional[str] = None) -> str:
        frames = np.stack(self._frames, 0)
        tris = np.concatenate(self._tris, 0)
        if obj_dir is not None:
            import os

            from ..io.export import write_obj
            os.makedirs(obj_dir, exist_ok=True)
            for i, fr in enumerate(frames):
                write_obj(os.path.join(obj_dir, f"frame_{i:05d}.obj"),
                          fr, triangles=tris)
        return export_html(path, frames, tris, fps=fps, title=title)
