from staticfusion_tpu.solver import clustering, segmentation, irls, runsolver

__all__ = ["clustering", "segmentation", "irls", "runsolver"]
