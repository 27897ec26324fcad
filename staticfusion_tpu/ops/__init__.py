from staticfusion_tpu.ops import pyramid, warp, derivatives, bilateral, zbuffer

__all__ = ["pyramid", "warp", "derivatives", "bilateral", "zbuffer"]
