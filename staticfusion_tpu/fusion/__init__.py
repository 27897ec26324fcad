from staticfusion_tpu.fusion import (association, backend, clean, indexmap,
                                     predict, surfels, texelmap, update)

__all__ = ["association", "backend", "clean", "indexmap", "predict",
           "surfels", "texelmap", "update"]
