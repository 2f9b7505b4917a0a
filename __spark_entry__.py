"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (the map->group-by-tile pyramid) on
  /root/testdata/sf0.001.
- ``queries()`` — every implemented operator from SURVEY.md §2 as
  (spark, sf_dir) -> DataFrame callables (planetiler_spark.plans.queries).
- ``oracle_sql()`` — DuckDB oracles built from the same scalar SQL fragments
  as the Spark plans (planetiler_spark.functions.exprs), so value hashes
  match bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from planetiler_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full map->sort->group-by-tile pipeline (render/slice ->
    shuffle on the 64-bit feature key -> applyInPandas MVT encode) over the
    deterministic images table at sf0.001 scale."""
    return Q.images_tileset(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return Q.resolve_oracles()
