"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship championship-tracker-shaped query on
sf0.001; ``queries()``/``oracle_sql()`` expose the operator registry
(one entry per SURVEY.md §2 operator family) for the DuckDB hash-match
correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The harness may import this module with any cwd; make the package findable.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from f1_datalakehouse_pipeline_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["w4_w6_w7_championship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
