"""As-of (point-in-time) join — the classic operator Spark lacks natively.

``asof_join_backward(left, right, ...)`` attaches, to every left row, the
latest right row of the same key whose timestamp is <= the left row's
timestamp (the market-data / feature-store "no lookahead" join; here:
each event gets the customer's most recent prior order).

Spark-first plan — ONE shuffle, no per-key quadratic work: instead of a
range join (``l.key = r.key AND r.t <= l.t`` explodes to O(|L_k|·|R_k|)
rows per key before the argmax prunes them), both inputs are UNIONED with
a side tag, shuffled once on the key, sorted by (time, side, right-id)
inside each partition, and the last right row is carried forward with
``last(struct, ignorenulls=True)`` over a running window — the classic
sort-merge as-of expressed declaratively, so Catalyst handles the
exchange, the in-partition sort, and AQE handles hot-key skew. Right
columns travel as ONE struct so the carried values always come from the
same right row (per-column ``last`` could mix rows if a right column were
null).

Tie semantics (deterministic on both engines): at equal timestamps the
right row COUNTS (<=, right sorts before left via the side tag) and the
greatest right id wins among equal-time right rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_id: str,
    right_cols: list[str],
) -> DataFrame:
    """Left rows + struct column ``asof`` holding the matched right row's
    ``right_cols`` (null struct when the key has no prior right row).
    Output columns: every left column, then ``asof``."""
    left_cols = left.columns
    # withColumn REPLACES an existing column silently: a left frame that
    # already carries a working/output name would be clobbered (or emit a
    # duplicate 'asof') and corrupt results with no error — refuse loudly
    reserved = {"_k", "_t", "_side", "_rid", "_rrow", "asof"}
    clash = reserved.intersection(left_cols).union(reserved.intersection(right.columns))
    if clash:
        raise ValueError(
            f"asof_join_backward: input columns {sorted(clash)} collide with "
            f"reserved working/output names {sorted(reserved)}; rename them first"
        )
    l = (
        left.withColumn("_k", F.col(left_on))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_rid", F.lit(None).cast("long"))
    )
    r = (
        right.select(
            F.col(right_on).alias("_k"),
            F.col(right_time).alias("_t"),
            F.lit(0).alias("_side"),
            F.col(right_id).cast("long").alias("_rid"),
            F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
        )
        # a NULL right timestamp can match nothing (SQL: t <= ts is never
        # true) — and the window's NULLS FIRST ordering would otherwise
        # make it the "earliest" row and carry it into unmatched keys
        .filter(F.col("_t").isNotNull())
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("asof", F.last("_rrow", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(*left_cols, "asof")
