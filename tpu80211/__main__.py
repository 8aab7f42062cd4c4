"""`python -m tpu80211` entry point."""

import sys

from tpu80211.cli import main

sys.exit(main())
