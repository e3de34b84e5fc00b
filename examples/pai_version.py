"""Mirror of reference examples/pai_version.py: print the package version."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import my_polars_ai_spark

print(my_polars_ai_spark.__version__)
