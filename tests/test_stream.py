"""Live RGB-D stream bridge (io/stream.py + apps/run_camera.py).

The reference's live mode is an OpenNI2 camera loop
(StaticFusion-camera.cpp, Utils/RGBD_Camera.cpp); here the same loop is
fed by the SFRD byte stream.  These tests drive the REAL end-to-end path:
a producer thread paces frames over a socketpair at sensor rate and the
full SlamSystem consumes them live.
"""

import io
import socket
import struct
import threading
import time

import numpy as np
import pytest

from staticfusion_tpu.config import CameraConfig, FusionConfig, SFConfig
from staticfusion_tpu.io import stream, synthetic

CONFIG = SFConfig(camera=CameraConfig(width=80, height=60),
                  fusion=FusionConfig(capacity=1 << 13))


def _make_frames(n=8):
    twist = np.array([0.004, -0.002, 0.006, 0.0015, -0.001, 0.002],
                     np.float32)
    frames, _ = synthetic.make_sequence(CONFIG, n, twist)
    return frames


def _record(frames, ts0=1000.0, dt=1 / 30.0) -> bytes:
    buf = io.BytesIO()
    stream.write_stream_header(buf, CONFIG.cols, CONFIG.rows)
    for i, (rgb, depth_mm, _) in enumerate(frames):
        stream.write_frame(buf, rgb, depth_mm, ts0 + i * dt)
    stream.write_stream_end(buf)
    return buf.getvalue()


def test_roundtrip_replay_is_exact():
    frames = _make_frames(4)
    blob = _record(frames)
    src = stream.StreamSource(io.BytesIO(blob), latest_only=False,
                              max_distance_m=100.0)
    for i, (rgb, depth_mm, _) in enumerate(frames):
        got = src.get()
        assert got is not None
        g_rgb, g_depth, ts = got
        # u8 quantization on the wire.
        want = np.round(np.clip(rgb, 0, 1) * 255) / 255.0
        np.testing.assert_allclose(g_rgb, want, atol=1e-6)
        np.testing.assert_array_equal(g_depth,
                                      depth_mm.astype(np.uint16))
        assert ts == pytest.approx(1000.0 + i / 30.0)
    assert src.get() is None


def test_camera_range_gate_and_mirror():
    rgb = np.zeros((60, 80, 3), np.float32)
    rgb[:, :40] = 1.0
    depth = np.full((60, 80), 2500.0, np.float32)
    depth[0, 0] = 3500.0   # beyond the 3 m sensor gate
    buf = io.BytesIO()
    stream.write_stream_header(buf, 80, 60)
    stream.write_frame(buf, rgb, depth, 0.0)
    stream.write_stream_end(buf)
    src = stream.StreamSource(io.BytesIO(buf.getvalue()), latest_only=False,
                              mirror=True)
    g_rgb, g_depth, _ = src.get()
    assert g_depth[0, -1] == 0.0           # gated (RGBD_Camera.cpp:155-167)
    assert g_depth[0, 0] == 2500.0
    assert g_rgb[0, 0, 0] == 0.0 and g_rgb[0, -1, 0] == 1.0  # mirrored


def test_format_errors():
    with pytest.raises(stream.StreamFormatError):
        stream.StreamReader(io.BytesIO(b"JUNKxxxxxxxxxxxx"))
    # Truncated payload.
    frames = _make_frames(1)
    blob = _record(frames)[:-500]
    r = stream.StreamReader(io.BytesIO(blob))
    with pytest.raises(stream.StreamFormatError):
        while r.next_frame() is not None:
            pass


def test_drop_to_latest_live_semantics():
    """A slow consumer must see the NEWEST frame, not a backlog."""
    frames = _make_frames(6)
    a, b = socket.socketpair()
    fa, fb = a.makefile("wb"), b.makefile("rb")

    def produce():
        stream.write_stream_header(fa, CONFIG.cols, CONFIG.rows)
        fa.flush()
        for i, (rgb, depth_mm, _) in enumerate(frames):
            stream.write_frame(fa, rgb, depth_mm, time.time())
            fa.flush()
            time.sleep(0.02)
        stream.write_stream_end(fa)
        fa.flush()
        fa.close()

    t = threading.Thread(target=produce)
    t.start()
    src = stream.StreamSource(fb, latest_only=True, max_distance_m=100.0)
    got = []
    while True:
        item = src.get()
        if item is None:
            break
        got.append(item)
        time.sleep(0.07)       # consumer ~3.5x slower than the producer
    t.join()
    assert src.received == 6
    assert src.dropped >= 2                 # stale frames were skipped
    assert len(got) == src.received - src.dropped
    assert len(src.latencies) == len(got)
    assert all(lat < 5.0 for lat in src.latencies)


def test_run_camera_loop_from_paced_stream():
    """End to end: the run_camera loop + full SlamSystem consuming a paced
    socket stream (the VERDICT's live-input demonstration), with per-frame
    latency logged."""
    from apps.run_camera import run_loop
    from staticfusion_tpu.pipeline.system import SlamSystem

    frames = _make_frames(7)
    a, b = socket.socketpair()
    fa, fb = a.makefile("wb"), b.makefile("rb")

    def produce():
        stream.write_stream_header(fa, CONFIG.cols, CONFIG.rows)
        fa.flush()
        for rgb, depth_mm, _ in frames:
            stream.write_frame(fa, rgb, depth_mm, time.time())
            fa.flush()
            time.sleep(0.01)
        stream.write_stream_end(fa)
        fa.flush()
        fa.close()

    t = threading.Thread(target=produce)
    t.start()
    # Replay mode: every frame, deterministic (the live drop path is
    # covered above; XLA compiles here would starve a drop-to-latest run).
    src = stream.StreamSource(fb, latest_only=False, max_distance_m=100.0)
    slam = SlamSystem(CONFIG)
    latencies = run_loop(slam, src, max_frames=None, log_every=100)
    t.join()
    assert len(slam.poses) == len(frames) - 1   # frame 0 pairs into bootstrap
    assert len(latencies) == len(frames)
    assert all(lat >= 0 for lat in latencies)
    # The tracker actually tracked (poses advance smoothly).
    import jax.numpy as jnp  # noqa: F401
    p_last = np.asarray(slam.poses[-1])
    assert np.isfinite(p_last).all()
    assert 0 < np.linalg.norm(p_last[:3, 3]) < 0.2
