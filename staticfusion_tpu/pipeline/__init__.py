from staticfusion_tpu.pipeline import state, step, system

__all__ = ["state", "step", "system"]
