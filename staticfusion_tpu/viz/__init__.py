from staticfusion_tpu.viz import offline

__all__ = ["offline"]
