"""Pinhole camera model(s) used by the solver and the fusion backend.

The reference carries two implicit camera conventions that agree on the
principal point but not the focal lengths:

* The CPU solver uses a single focal from the horizontal FOV for both axes
  and principal point ((cols-1)/2, (rows-1)/2) in pixel-index coordinates
  (FrontEnd.cpp:377-388, 537, 778-780).
* The GL backend uses Intrinsics (fx, fy, cols/2, rows/2) sampled at pixel
  centers i+0.5 (FrontEnd.cpp:165; geometry.glsl getVertex), which is the
  same offset (i + 0.5 - n/2 == i - (n-1)/2) with separate fx/fy.

Both are expressed here as `Pinhole` in pixel-index coordinates.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from staticfusion_tpu.config import SFConfig


@dataclasses.dataclass(frozen=True)
class Pinhole:
    fx: float
    fy: float
    cx: float  # principal point in pixel-index coords: (cols-1)/2
    cy: float
    rows: int
    cols: int

    @staticmethod
    def solver(config: SFConfig, level: int = 0) -> "Pinhole":
        """The solver camera at a pyramid level: one focal from fovh.

        f = cols_i / (2 tan(fovh/2))  (FrontEnd.cpp:537,778)
        """
        rows_i, cols_i = config.level_shape(level)
        f = cols_i / (2.0 * math.tan(0.5 * config.camera.fovh))
        return Pinhole(fx=f, fy=f, cx=0.5 * (cols_i - 1), cy=0.5 * (rows_i - 1),
                       rows=rows_i, cols=cols_i)

    @staticmethod
    def fusion(config: SFConfig, factor: int = 1) -> "Pinhole":
        """The backend camera (optionally at the index-map super-resolution).

        fx, fy from fovh/fovv (FrontEnd.cpp:62-63,165); principal point
        expressed in index coords ((n-1)/2 after the half-pixel shift).
        """
        cam = config.camera
        return Pinhole(
            fx=cam.fx * factor,
            fy=cam.fy * factor,
            cx=0.5 * (cam.width * factor - 1),
            cy=0.5 * (cam.height * factor - 1),
            rows=cam.height * factor,
            cols=cam.width * factor,
        )

    def pixel_offsets(self, dtype=jnp.float32):
        """(u - cx) and (v - cy) grids of shape (rows, cols)."""
        uu = jnp.arange(self.cols, dtype=dtype)[None, :] - jnp.asarray(self.cx, dtype)
        vv = jnp.arange(self.rows, dtype=dtype)[:, None] - jnp.asarray(self.cy, dtype)
        return jnp.broadcast_to(uu, (self.rows, self.cols)), jnp.broadcast_to(
            vv, (self.rows, self.cols))

    def backproject(self, depth: jnp.ndarray):
        """depth (rows, cols) -> (x, y) lateral coordinate images.

        x = (u - cx) * z / fx, y = (v - cy) * z / fy; zero depth stays zero.
        """
        du, dv = self.pixel_offsets(depth.dtype)
        return du * depth / self.fx, dv * depth / self.fy

    def project(self, p: jnp.ndarray):
        """(…,3) camera-frame points -> (u, v, z) in pixel-index coords."""
        z = p[..., 2]
        safe_z = jnp.where(z == 0, 1.0, z)
        u = self.fx * p[..., 0] / safe_z + self.cx
        v = self.fy * p[..., 1] / safe_z + self.cy
        return u, v, z

    def rays(self, dtype=jnp.float32):
        """Unit-z rays (rows, cols, 3): ((u-cx)/fx, (v-cy)/fy, 1)."""
        du, dv = self.pixel_offsets(dtype)
        ones = jnp.ones_like(du)
        return jnp.stack([du / self.fx, dv / self.fy, ones], axis=-1)
