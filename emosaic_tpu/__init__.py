"""emosaic_tpu — a TPU-native photomosaic framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the `emosaic`
reference (pepeiborra/emosaic): tile-library analysis, nearest-tile matching
(exact Manhattan/L1 color distance), mosaic composition with tint blending,
no-repeat assignment, statistics, HTML widget output, and a flag-service
backend.

Architecture (TPU-first, not a translation):

- Host layer (Python + C++ `native/`): image decode/encode, directory walking,
  EXIF, white-border trim + crop + resize tile preparation, the two persistent
  caches (`.emosaic_{N}to1[_cropped]` analysis cache and the content-hash
  prepared-tile cache), CLI, stats/HTML generation, and the sequential greedy
  no-repeat assignment engine.
- Device layer (JAX/XLA/Pallas): batched palette analysis (box-mean reduction
  over the whole tile stack at once), fused L1 distance + argmin matching —
  either a VMEM-tiled Pallas kernel (general N) or an exact separable min-plus
  distance transform over the 256^3 RGB lattice (N=1), top-k candidate
  generation, and gather-based mosaic composition with fused tint alpha-blend.
- Parallel layer: `jax.sharding.Mesh` + `shard_map` sharding of the source
  block axis (data parallelism) and the tile-library axis (model parallelism)
  with associative (min, argmin) combining over ICI.

Reference parity notes are cited inline as `file:line` under /root/reference.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU first-compiles are tens of seconds
# (esp. through a tunnel); cache them across processes. Opt out with
# EMOSAIC_NO_COMPILE_CACHE=1.
if not _os.environ.get("EMOSAIC_NO_COMPILE_CACHE"):
    _cc = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(
            _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
            "emosaic_tpu",
            "xla",
        ),
    )
    try:
        _os.makedirs(_cc, exist_ok=True)
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cc)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from emosaic_tpu.modes import MODE_TO_N, Mode  # noqa: F401
