#!/usr/bin/env python
"""spark-submit driver script: ship the package with --py-files and
run the CLI (see entity_linking_in_biomedical_spark/cli.py docstring).

    spark-submit --py-files elspark.zip run_el.py run --documents ... \
        --entities ... --out ...
"""

import sys

from entity_linking_in_biomedical_spark.cli import main

sys.exit(main())
