"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: ray-casting PIP spatial join of event-derived
                 points against a broadcast polygon index, per-polygon
                 counts (the "count images per municipality" query from
                 SURVEY.md §7 step 4, on sf0.001).
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); see jpspark/queries.py.
oracle_sql()   — matching DuckDB SQL for EVERY query key (48/48 since
                 round 3: the approximate regimes are gated on candidate-
                 superset audits / recall@k numbers vs exhaustive SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jpspark.queries import QUERIES, build_oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001 (driver checks rows>0): the
    north_star composition — geotagged image table through decode/pHash
    curation, PIP assignment, and the checkpointed manifest, aggregated
    per municipality (see q_geo_image_pipeline)."""
    return QUERIES["geo_image_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(build_oracles())
