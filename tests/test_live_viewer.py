"""Live viewport: HTTP page + binary frame stream (VERDICT missing #2).

Drives render/live.py the way the browser player does: fetch the page,
then poll /frame and check the published positions arrive bit-exact with a
monotonic frame index.  Also exercises the PBD1 serve --view path: a
loopback client steps the server and the viewer sees fresh frames.
"""

import json
import urllib.request

import numpy as np
import pytest

from softbodysim_tpu.render.live import LiveViewer

pytestmark = pytest.mark.quick


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read(), dict(r.headers)


def test_page_and_frame_roundtrip():
    tris = np.array([[0, 1, 2], [1, 2, 3]], np.int64)
    pos = np.arange(12, dtype=np.float32).reshape(4, 3)
    lv = LiveViewer(tris, lambda: pos, port=0)
    try:
        page, _ = _get(lv.url)
        assert b"webgl2" in page and b"NV=4" in page
        body, hdr = _get(lv.url + "frame")
        assert hdr["X-Frame-Index"] == "1"
        np.testing.assert_array_equal(
            np.frombuffer(body, np.float32).reshape(4, 3), pos)

        pos2 = pos + 1.0
        lv.publish(pos2)
        body, hdr = _get(lv.url + "frame")
        assert hdr["X-Frame-Index"] == "2"
        np.testing.assert_array_equal(
            np.frombuffer(body, np.float32).reshape(4, 3), pos2)

        stats, _ = _get(lv.url + "stats")
        assert json.loads(stats) == {"frames": 2, "nv": 4}
    finally:
        lv.stop()


def test_serve_view_streams_frames():
    """PBD1 server with --view: stepping over the wire publishes live
    frames (the reference's viewport analog end-to-end)."""
    from softbodysim_tpu.api.client import PBDClient
    from softbodysim_tpu.api.server import PBDServer
    from softbodysim_tpu.core import meshes

    srv = PBDServer(host="127.0.0.1", port=0, view=True, view_port=0)
    srv.start_background()
    topo = meshes.tet_cube(2, 2, 2, size=0.5, center=(0.0, 0.8, 0.0))
    cli = PBDClient("127.0.0.1", srv.port, timeout=300.0)
    try:
        cli.init(topo.vertices, topo.edges, topo.tets)
        p0 = cli.step(1.0 / 60.0)
        p1 = cli.step(1.0 / 60.0)
        # publish happens just after the socket reply: allow the server
        # thread to catch up
        import time
        for _ in range(100):
            if srv._viewer is not None and srv._viewer.frames_published >= 2:
                break
            time.sleep(0.05)
        assert srv._viewer is not None
        assert srv._viewer.frames_published >= 2
        body, _ = _get(srv._viewer.url + "frame")
        np.testing.assert_allclose(
            np.frombuffer(body, np.float32).reshape(-1, 3), p1, atol=0)
    finally:
        cli.close()
