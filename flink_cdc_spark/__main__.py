"""``python -m flink_cdc_spark`` — the flink-cdc.sh analog (cli.py)."""

import sys

from .cli import main

sys.exit(main())
