"""Binary PLY export of the surfel map.

Reference: `Reconstruction::savePly` (Reconstruction.cpp:358-485) — vertices
above the confidence threshold with color, flipped normal, radius; binary
little-endian.
"""

from __future__ import annotations

import numpy as np


def save_ply(path: str, smap, confidence_threshold: float) -> None:
    try:
        from staticfusion_tpu.io.native import write_ply_native

        write_ply_native(path, smap, confidence_threshold)
        return
    except Exception:
        pass
    pos = np.asarray(smap.pos)
    conf = np.asarray(smap.conf)
    color = np.asarray(smap.color)
    normal = np.asarray(smap.normal)
    radius = np.asarray(smap.radius)
    valid = np.asarray(smap.valid)

    keep = valid & (conf > confidence_threshold)
    n = int(keep.sum())

    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property float radius\n"
        "end_header\n"
    )

    rec = np.zeros(n, dtype=[
        ("xyz", np.float32, 3), ("rgb", np.uint8, 3),
        ("normal", np.float32, 3), ("radius", np.float32)])
    rec["xyz"] = pos[keep]
    rec["rgb"] = np.clip(np.round(color[keep] * 255.0), 0, 255).astype(np.uint8)
    rec["normal"] = -normal[keep]  # the reference flips normals on export
    rec["radius"] = radius[keep]

    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def load_ply_count(path: str) -> int:
    """Parse just the vertex count (for tests)."""
    with open(path, "rb") as f:
        for raw in f:
            line = raw.decode("ascii", errors="ignore").strip()
            if line.startswith("element vertex"):
                return int(line.split()[-1])
            if line == "end_header":
                break
    return 0
