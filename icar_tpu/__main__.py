"""CLI: ``python -m icar_tpu options.nml`` — the equivalent of
``./icar icar_options.nml`` (driver.f90:19)."""

import sys

from .core.driver import main

if __name__ == "__main__":
    sys.exit(main())
