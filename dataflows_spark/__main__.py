"""``python -m dataflows_spark`` → the init/run CLI (reference
``dataflows`` console entrypoint analog)."""

import sys

from .cli import main

sys.exit(main())
