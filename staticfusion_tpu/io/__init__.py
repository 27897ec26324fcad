from staticfusion_tpu.io import synthetic, trajectory, tum

__all__ = ["synthetic", "trajectory", "tum"]
