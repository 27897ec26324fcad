"""Offline visualization: the reference GUI's image panels as saved figures.

Reference panels (Utils/GUI.h:87-99, Reconstruction.cpp:734-760): RGB, depth
norm, static-probability weights (red=dynamic, blue=static), cluster labels.
Pangolin-style interactive 3D is a non-goal; the map can be exported to PLY
and viewed externally.
"""

from __future__ import annotations

import numpy as np


def weight_panel(static_prob: np.ndarray, depth_mm: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8: red->blue static probability, black where no depth
    (Reconstruction.cpp:740-746)."""
    w = np.clip(np.asarray(static_prob), 0.0, 1.0)
    has = np.asarray(depth_mm) > 0
    img = np.zeros(w.shape + (3,), np.uint8)
    img[..., 0] = np.where(has, (255 * (1.0 - w)).astype(np.uint8), 0)
    img[..., 2] = np.where(has, (255 * w).astype(np.uint8), 0)
    return img


def label_panel(labels: np.ndarray, num_clusters: int = 24) -> np.ndarray:
    """Grayscale cluster labels (Reconstruction.cpp:751-753)."""
    g = (255 * np.asarray(labels) / num_clusters).astype(np.uint8)
    return np.stack([g] * 3, axis=-1)


def depth_panel(depth_mm: np.ndarray, max_depth_m: float = 4.5) -> np.ndarray:
    """1 - d/max grayscale (depth_norm.frag)."""
    d = np.asarray(depth_mm) / 1000.0
    g = np.where(d > 0, 1.0 - np.clip(d / max_depth_m, 0, 1), 0.0)
    g8 = (255 * g).astype(np.uint8)
    return np.stack([g8] * 3, axis=-1)


def save_frame_panels(path: str, rgb: np.ndarray, depth_mm: np.ndarray,
                      out) -> None:
    """2x2 panel figure: rgb | depth || weights | labels."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(8, 6))
    axes[0, 0].imshow(np.asarray(rgb))
    axes[0, 0].set_title("rgb")
    axes[0, 1].imshow(depth_panel(depth_mm))
    axes[0, 1].set_title("depth")
    axes[1, 0].imshow(weight_panel(np.asarray(out.static_prob), depth_mm))
    axes[1, 0].set_title("static prob")
    axes[1, 1].imshow(label_panel(np.asarray(out.labels)))
    axes[1, 1].set_title("clusters")
    for ax in axes.ravel():
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
