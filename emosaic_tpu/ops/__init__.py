"""Device-side (JAX/XLA/Pallas) compute kernels."""

from emosaic_tpu.ops.analysis import analyse_batch, source_blocks  # noqa: F401
from emosaic_tpu.ops.distance import (  # noqa: F401
    build_library,
    l1_argmin,
    l1_argmin_xla,
    l1_dist_matrix,
    l1_topk,
    l1_topk_streamed,
    l2_argmin,
)
from emosaic_tpu.ops.lut import (  # noqa: F401
    build_l1_lut,
    lut_match,
    lut_match_packed,
    pack_rgb,
)
from emosaic_tpu.ops.composite import (  # noqa: F401
    compose_mosaic,
    iter_bands,
    tint_blend,
    tint_blend_band,
)
