"""Host-side I/O: image discovery, decode/encode, EXIF, tile preparation."""

from emosaic_tpu.io.discovery import find_images  # noqa: F401
from emosaic_tpu.io.exif import get_exif_date, get_orientation  # noqa: F401
from emosaic_tpu.io.prep import prepare_tile, prepare_tile_with_date  # noqa: F401
