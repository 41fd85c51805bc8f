#!/usr/bin/env python
"""spark-submit launcher (BASELINE.json north_rule: "launched via
spark-submit --py-files").

spark-submit takes a SCRIPT, not a module, and the engine package uses
relative imports — so this absolute-import shim is the file you pass:

    zip -r engine.zip distributed_system___ocr_spark
    spark-submit --py-files engine.zip submit.py \\
        --input /path/pages_parquet --output /path/out --run-id r1

Locally (package on PYTHONPATH) `python -m
distributed_system___ocr_spark.cli` is equivalent.
"""

import sys

from distributed_system___ocr_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
