"""Unified CLI: python -m softbodysim_tpu <command>

Commands:
  serve   PBD1 TCP server (reference PBDServer CLI parity)
  scene   run a reference benchmark scene preset with 1 Hz stats
  bench   constraint-projection throughput (one JSON line)
  info    devices / version / native-lib status
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="softbodysim_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    serve = sub.add_parser("serve", help="PBD1 TCP server")
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=7777)
    serve.add_argument("--mode", choices=["serial", "parallel"],
                       default="serial")
    serve.add_argument("--threads", type=int, default=0)
    serve.add_argument("--view", action="store_true",
                       help="live browser viewport of the simulated body")
    serve.add_argument("--view-port", type=int, default=8900)
    serve.add_argument("--pipeline", action="store_true",
                       help="overlap device compute with the round trip "
                            "(reply carries the previous step's positions)")
    serve.add_argument("--multi", action="store_true",
                       help="serve many concurrent clients, one engine per "
                            "session")

    scene = sub.add_parser("scene", help="run a benchmark scene preset")
    scene.add_argument("name", choices=["sample", "4fumo", "extreme",
                                        "batch"])
    scene.add_argument("--seconds", type=float, default=3.0)
    scene.add_argument("--view", action="store_true",
                       help="live browser viewport while the scene runs")
    scene.add_argument("--view-port", type=int, default=8900)

    bench = sub.add_parser("bench", help="throughput benchmark (JSON line)")
    bench.add_argument("--batch", type=int, default=128)

    sub.add_parser("info", help="environment info")

    tetra = sub.add_parser(
        "tetra", help="tetrahedralize a closed OBJ into a .tet.npz asset")
    tetra.add_argument("input", help="closed triangle mesh (.obj)")
    tetra.add_argument("-o", "--output", required=True,
                       help="output topology file (.tet.npz)")
    tetra.add_argument("--no-snap", action="store_true",
                       help="keep the raw voxel hull (skip the "
                            "surface-conforming snap)")
    tetra.add_argument("--resolution", type=int, default=12,
                       help="voxels across the longest extent")

    args = ap.parse_args(argv)

    if args.cmd == "serve":
        from .api.server import PBDServer

        srv = PBDServer(host=args.host, port=args.port, mode=args.mode,
                        pipeline=args.pipeline,
                        view=args.view, view_port=args.view_port)
        srv.serve_forever() if args.multi else srv.serve_one()
    elif args.cmd == "scene":
        sys.argv = ["scene", "--scene", args.name,
                    "--seconds", str(args.seconds)]
        from .api.scenes import ALL_SCENES
        import time
        import numpy as np

        import jax

        sc = ALL_SCENES[args.name]()
        # merged-mesh Pallas execution is the fast path on TPU (ExtremeTest
        # 728 steps/s vs 190 grouped, BatchTest 60 vs 5); fall back to
        # grouped vmap off-TPU or for mixed-params scenes
        merged = None
        if jax.default_backend() == "tpu":
            try:
                merged, _ = sc.build_merged()
            except ValueError:
                merged = None
        viewer = None
        if args.view and merged is None:
            # per-body world path: concatenated surfaces, any scene
            world = sc.build_world()
            from .render.live import LiveViewer

            tris, off = [], 0
            for b in world.bodies:
                tris.append(
                    np.asarray(b.topology.surface_tris, np.int64) + off)
                off += b.topology.num_particles

            def world_positions():
                return np.concatenate(
                    [b.positions() for b in world.bodies], axis=0)

            viewer = LiveViewer(np.concatenate(tris, 0), world_positions,
                                port=args.view_port, title=sc.name)
            print("live viewer at", viewer.url)
            eng = world
            burst = 1
        else:
            eng = merged if merged is not None else sc.build_grouped()
            # merged engines advance in RUN_CHUNK bursts (one compiled
            # program); grouped engines dispatch per step
            burst = eng.RUN_CHUNK if merged is not None else 1
            if args.view and merged is not None:
                from .render.live import LiveViewer

                viewer = LiveViewer(merged.topology.surface_tris,
                                    merged.positions, port=args.view_port,
                                    title=sc.name)
                print("live viewer at", viewer.url)
                burst = 4                 # smoother frame cadence

        def advance():
            if burst > 1:
                eng.run(burst)
            else:
                eng.step()
            if viewer is not None:
                viewer.publish()

        block = getattr(eng, "block", None) or getattr(eng, "sync")
        advance()
        block()
        t_end = time.time() + args.seconds
        last = time.time()
        frames = 0
        while time.time() < t_end:
            advance()
            frames += burst
            if time.time() - last >= 1.0:
                block()
                print(f"[{sc.name}] {frames / (time.time() - last):.1f} "
                      "steps/s")
                last = time.time()
                frames = 0
        block()
        if merged is not None:
            min_y = float(eng.positions()[:, 1].min())
        elif viewer is not None:
            min_y = float(world_positions()[:, 1].min())
        else:
            min_y = float(min(
                pos[:, 1].min() for _, pos in eng.positions()))
        print("min_y =", min_y)
    elif args.cmd == "bench":
        import runpy
        import os

        root = os.path.join(os.path.dirname(__file__), "..")
        sys.argv = ["bench.py"]
        runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
    elif args.cmd == "tetra":
        from .core.tetrahedralize import topology_from_obj
        from .io import save_topology

        topo = topology_from_obj(args.input, resolution=args.resolution,
                         snap=not args.no_snap)
        save_topology(args.output, topo)
        print(f"{args.input} -> {args.output}: V={topo.num_particles} "
              f"E={topo.num_edges} T={topo.num_tets} "
              f"S={len(topo.surface_tris)}")
    elif args.cmd == "info":
        import jax

        from . import __version__
        from .core.native import available

        print(f"softbodysim_tpu {__version__}")
        print(f"jax {jax.__version__}, backend {jax.default_backend()}")
        print(f"devices: {jax.devices()}")
        print(f"native lib: {'built' if available() else 'NumPy fallback'}")


if __name__ == "__main__":
    main()
