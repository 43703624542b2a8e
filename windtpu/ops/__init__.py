from windtpu.ops.stencil import (  # noqa: F401
    disc_mean,
    gradient_descriptors,
    topographic_descriptors,
    tpi,
)
