"""`python -m emosaic_tpu` — the CLI entry point."""

import sys

from emosaic_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
