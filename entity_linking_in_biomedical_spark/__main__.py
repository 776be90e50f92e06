"""``python -m entity_linking_in_biomedical_spark`` -> cli.main()."""

import sys

from .cli import main

sys.exit(main())
