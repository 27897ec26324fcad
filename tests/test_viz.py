"""Offline visualization: map rendering (viz/render.py) + GUI panels
(viz/offline.py).

Reference parity targets: GlobalModel::renderPointCloud /
draw_global_surface.* color modes, IndexMap::renderDepth, and the GUI
image panels (Utils/GUI.h:87-99, Reconstruction.cpp:734-760)."""

import jax.numpy as jnp
import numpy as np

from staticfusion_tpu.config import SFConfig, CameraConfig, FusionConfig
from staticfusion_tpu.fusion import surfels
from staticfusion_tpu.geometry import se3
from staticfusion_tpu.viz import offline
from staticfusion_tpu.viz.render import MODES, render_map, render_view

CONFIG = SFConfig(camera=CameraConfig(width=80, height=60),
                  fusion=FusionConfig(capacity=1 << 13))


def _make_map(depth=2.0):
    rows, cols = CONFIG.rows, CONFIG.cols
    d = np.full((rows, cols), depth, np.float32)
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    rgb = np.stack([0.5 + 0.4 * np.sin(xx / 17.0),
                    0.5 + 0.4 * np.cos(yy / 13.0),
                    np.full_like(xx, 0.5)], axis=-1).astype(np.float32)
    sp = np.ones_like(d)
    smap = surfels.initialise_map(CONFIG.fusion.capacity, jnp.asarray(d),
                                  jnp.asarray(d), jnp.asarray(rgb),
                                  jnp.asarray(sp), jnp.eye(4), CONFIG)
    return smap, d, rgb


def test_render_modes_shapes_and_coverage():
    smap, d, rgb = _make_map()
    for mode in MODES:
        img = render_map(smap, np.eye(4), CONFIG, mode=mode)
        assert img.shape == (CONFIG.rows, CONFIG.cols, 3)
        assert img.dtype == np.uint8
        # The flat wall fills (nearly) the full frame.
        lit = (img.sum(axis=-1) > 0).mean()
        assert lit > 0.95, (mode, lit)


def test_render_rgb_matches_map_colors():
    smap, d, rgb = _make_map()
    img = render_map(smap, np.eye(4), CONFIG, mode="rgb")
    got = img.astype(np.float32) / 255.0
    # Smooth texture: allow neighboring-surfel paint like the fusion tests.
    err = np.abs(got - rgb).mean()
    assert err < 0.05, err


def test_render_depth_mode_darkens_with_distance():
    near, _, _ = _make_map(depth=1.0)
    far, _, _ = _make_map(depth=4.0)
    g_near = render_map(near, np.eye(4), CONFIG, mode="depth").mean()
    g_far = render_map(far, np.eye(4), CONFIG, mode="depth").mean()
    assert g_near > g_far  # depth_norm.frag: brighter = closer


def test_render_from_moved_viewpoint():
    """Rendering from a translated pose shifts the visible wall."""
    smap, d, _ = _make_map()
    T = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.3, 0.0, -0.5, 0.0, 0.0, 0.0], np.float32))))
    view = render_view(smap, jnp.asarray(T), jnp.asarray(0.0), CONFIG)
    depth = np.asarray(view.depth)
    hit = depth > 0
    assert hit.mean() > 0.3
    # Camera backed away by 0.5: depths grow accordingly.
    np.testing.assert_allclose(depth[hit].mean(), 2.5, atol=0.05)


def test_normal_mode_encodes_wall_normal():
    smap, _, _ = _make_map()
    img = render_map(smap, np.eye(4), CONFIG, mode="normal")
    # Flat frontal wall: normal ~ (0,0,+1) in this convention
    # -> color ~ (128,128,255).
    center = img[CONFIG.rows // 2, CONFIG.cols // 2]
    assert abs(int(center[0]) - 128) <= 20
    assert abs(int(center[1]) - 128) <= 20
    assert center[2] >= 215


def test_offline_panels():
    rows, cols = 30, 40
    depth_mm = np.full((rows, cols), 2000.0, np.float32)
    depth_mm[0, 0] = 0.0
    prob = np.linspace(0, 1, rows * cols, dtype=np.float32).reshape(rows, cols)
    w = offline.weight_panel(prob, depth_mm)
    assert w.shape == (rows, cols, 3) and w.dtype == np.uint8
    assert tuple(w[0, 0]) == (0, 0, 0)  # no depth -> black
    labels = np.zeros((rows, cols), np.int32)
    l_img = offline.label_panel(labels)
    assert l_img.shape == (rows, cols, 3)
    d_img = offline.depth_panel(depth_mm)
    assert d_img.shape == (rows, cols, 3)


# ---------------------------------------------------------------------------
# Web viewer (viz/webviewer.py): the Pangolin-window replacement.

def _extract_data(html: str) -> dict:
    """Pull the embedded DATA json back out of the generated page."""
    import json

    start = html.index("const DATA = ") + len("const DATA = ")
    end = html.index(";\n", start)
    return json.loads(html[start:end])


def _decode(b64: str, dtype) -> np.ndarray:
    import base64

    return np.frombuffer(base64.b64decode(b64), dtype=dtype)


def test_webviewer_embeds_points_and_trajectories():
    from staticfusion_tpu.viz import webviewer

    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    col = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    traj = np.cumsum(np.ones((7, 3), np.float32) * 0.1, axis=0)
    html = webviewer.build_html(pts, col, [(traj, (80, 255, 120))])
    assert "<canvas" in html and "http" not in html.split("<script>")[1][:200]
    data = _extract_data(html)
    np.testing.assert_array_equal(
        _decode(data["pos"], np.float32).reshape(-1, 3), pts)
    got_col = _decode(data["col"], np.uint8).reshape(-1, 3)
    np.testing.assert_array_equal(
        got_col, np.clip(np.round(col * 255), 0, 255).astype(np.uint8))
    assert len(data["trajs"]) == 1
    np.testing.assert_array_equal(
        _decode(data["trajs"][0]["pts"], np.float32).reshape(-1, 3), traj)


def test_webviewer_save_html_applies_confidence_cut(tmp_path):
    from staticfusion_tpu.viz import webviewer

    smap, _, _ = _make_map()
    conf = np.asarray(smap.conf)
    valid = np.asarray(smap.valid)
    thr = float(np.median(conf[valid]))
    n_expect = int((valid & (conf > thr)).sum())

    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 1, 5)
    path = tmp_path / "map.html"
    webviewer.save_html(str(path), smap, thr, trajectory=poses)
    data = _extract_data(path.read_text())
    assert _decode(data["pos"], np.float32).size == n_expect * 3
    # (M,4,4) poses reduce to their translations.
    np.testing.assert_allclose(
        _decode(data["trajs"][0]["pts"], np.float32).reshape(-1, 3),
        poses[:, :3, 3])


def test_webviewer_from_ply_roundtrip(tmp_path):
    from staticfusion_tpu.io.ply import save_ply
    from staticfusion_tpu.viz import webviewer

    smap, _, _ = _make_map()
    ply = tmp_path / "map.ply"
    save_ply(str(ply), smap, 0.0)
    pos, col = webviewer.load_ply(str(ply))

    valid = np.asarray(smap.valid)
    keep = valid & (np.asarray(smap.conf) > 0.0)
    np.testing.assert_allclose(pos, np.asarray(smap.pos)[keep], atol=1e-6)
    expect_col = np.clip(np.round(np.asarray(smap.color)[keep] * 255.0),
                         0, 255).astype(np.uint8)
    np.testing.assert_array_equal(col, expect_col)

    html = tmp_path / "map.html"
    webviewer.main([str(ply), str(html), "--title", "t"])
    data = _extract_data(html.read_text())
    assert _decode(data["pos"], np.float32).size == pos.size


def test_live_viewer_serves_panels_and_metrics():
    """The --live view (viz/live.py): update() publishes a PNG mosaic and
    metrics; the HTTP endpoints serve them (the reference's GUI panels,
    Utils/GUI.h:87-99, as a headless web view)."""
    import json
    import urllib.request

    from staticfusion_tpu.viz.live import LiveViewer, compose_panels

    rng = np.random.default_rng(0)
    h, w = 24, 32
    rgb = rng.random((h, w, 3)).astype(np.float32)
    depth_mm = (rng.random((h, w)) * 3000).astype(np.float32)

    class Out:
        static_prob = rng.random((h, w)).astype(np.float32)
        labels = rng.integers(0, 25, (h, w))

    mosaic = compose_panels(rgb, depth_mm, np.asarray(Out.static_prob),
                            np.asarray(Out.labels))
    assert mosaic.shape == (2 * h, 2 * w, 3) and mosaic.dtype == np.uint8

    v = LiveViewer(port=0)  # ephemeral port
    try:
        v.update(rgb, depth_mm, Out(), frame=7, fps=42.0)
        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"StaticFusion-TPU live" in page
        png = urllib.request.urlopen(base + "/frame.png", timeout=5).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        met = json.loads(urllib.request.urlopen(
            base + "/metrics.json", timeout=5).read())
        assert met == {"frame": 7, "fps": 42.0}
    finally:
        v.close()


def test_live_viewer_interactive_controls():
    """Runtime controls (the reference's sliders, FrontEnd.cpp:1285-1286):
    /set updates confidence/depth/pause, params() reads them back into the
    run loop, /params.json serves them; the 6-panel mosaic carries the
    model + predicted renders."""
    import json
    import urllib.request

    from staticfusion_tpu.viz.live import LiveViewer, compose_panels

    rng = np.random.default_rng(1)
    h, w = 24, 32
    rgb = rng.random((h, w, 3)).astype(np.float32)
    depth_mm = (rng.random((h, w)) * 3000).astype(np.float32)
    model = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    mosaic = compose_panels(rgb, depth_mm, None, None,
                            model=model, model_img=model)
    assert mosaic.shape == (2 * h, 3 * w, 3)

    v = LiveViewer(port=0, conf=0.25, depth=4.5)
    try:
        base = f"http://127.0.0.1:{v.port}"
        p0 = json.loads(urllib.request.urlopen(
            base + "/params.json", timeout=5).read())
        assert p0 == {"conf": 0.25, "depth": 4.5, "pause": False}
        p1 = json.loads(urllib.request.urlopen(
            base + "/set?conf=0.6&depth=3.0&pause=1", timeout=5).read())
        assert p1 == {"conf": 0.6, "depth": 3.0, "pause": True}
        assert v.params() == p1
        # Out-of-range values clamp; pause toggles back off.
        json.loads(urllib.request.urlopen(
            base + "/set?conf=7&pause=0", timeout=5).read())
        assert v.params()["conf"] == 1.0
        assert v.params()["pause"] is False
        # The page ships the control elements.
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        for needle in (b'id="conf"', b'id="depth"', b'id="pause"'):
            assert needle in page
    finally:
        v.close()
