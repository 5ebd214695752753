"""`python -m melt_spark` → CLI (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
