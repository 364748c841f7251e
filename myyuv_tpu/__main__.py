"""``python -m myyuv_tpu`` entry point (reference: myyuv_cli)."""

import sys

from .cli import main

sys.exit(main())
