"""Device-side (JAX/XLA/Pallas) compute kernels."""

from emosaic_tpu.ops.analysis import analyse_batch, source_blocks  # noqa: F401
from emosaic_tpu.ops.distance import (  # noqa: F401
    build_library,
    l1_argmin_xla,
    l1_argmin,
    l1_topk,
)
from emosaic_tpu.ops.lut import build_l1_lut, lut_match  # noqa: F401
from emosaic_tpu.ops.composite import compose_mosaic, tint_blend  # noqa: F401
