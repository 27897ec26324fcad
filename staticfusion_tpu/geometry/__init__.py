from staticfusion_tpu.geometry import se3, camera

__all__ = ["se3", "camera"]
