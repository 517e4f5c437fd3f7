"""Structured-Streaming ingest wrapper.

The reference has NO streaming surface — its closest analogs are bounded
work queues with crash-resume (SURVEY §2.7), which map to the batch
checkpoint manifest (jpspark.manifest). This module exists for engine
completeness: a micro-batch ingest path for continuously-arriving payload
files (the "new mesh drop" scenario), built on ``readStream`` +
``foreachBatch`` so every micro-batch lands through the SAME checkpointed
sink as batch loads — one resume story for both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    schema: T.StructType,
    checkpoint_dir: str | None = None,
    transform=None,
):
    """Watch ``source_dir`` for new parquet files; each micro-batch is
    (optionally transformed and) appended via the per-partition manifest
    sink. Returns the StreamingQuery; callers use
    ``q.processAllAvailable(); q.stop()`` for bounded runs (tests) or let
    it run with a trigger in production.

    Exactly-once story: Spark's streaming checkpoint (source offsets) x
    our manifest (partition fingerprints) — a replayed micro-batch
    re-writes deterministically into its own epoch directory, so replays
    overwrite rather than duplicate (idempotent sink, the foreachBatch
    contract)."""
    from . import manifest as mf

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        df = transform(batch_df) if transform is not None else batch_df
        epoch_dir = os.path.join(out_dir, f"epoch={epoch_id:08d}")
        mf.write_checkpointed(df, epoch_dir, lineage=f"stream epoch {epoch_id} from {source_dir}")

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")  # drops may arrive as dirs
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_ingested(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all committed epochs."""
    return spark.read.parquet(os.path.join(out_dir, "epoch=*", "part-*.parquet"))
