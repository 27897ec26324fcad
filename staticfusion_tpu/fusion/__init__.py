from staticfusion_tpu.fusion import (association, backend, clean, indexmap,
                                     predict, surfels, update)

__all__ = ["association", "backend", "clean", "indexmap", "predict",
           "surfels", "update"]
