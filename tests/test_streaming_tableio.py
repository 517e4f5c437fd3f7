"""Streaming micro-batch ingest + TableIO seam."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jpspark import streaming, table_io


def test_stream_ingest_micro_batches(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "ingested")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    # first drop
    spark.range(100).withColumn("v", F.col("id") * 1.0).write.parquet(src + "/f1.parquet")
    q = streaming.stream_ingest(spark, src, out, schema)
    q.processAllAvailable()
    # second drop while the stream is live
    spark.range(100, 250).withColumn("v", F.col("id") * 1.0).write.parquet(src + "/f2.parquet")
    q.processAllAvailable()
    q.stop()
    back = streaming.read_ingested(spark, out)
    assert back.count() == 250
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(250))
    # every epoch directory carries its own manifest (resume story)
    epochs = [d for d in os.listdir(out) if d.startswith("epoch=")]
    assert epochs
    from jpspark.manifest import load_manifest

    for e in epochs:
        m = load_manifest(os.path.join(out, e))
        if m["partitions"]:
            assert all(p["status"] == "committed" for p in m["partitions"].values())


def test_tableio_parquet_fallback(spark, tmp_path):
    tio = table_io.TableIO(spark, str(tmp_path / "tables"))
    assert tio.catalog is None  # no Iceberg jar in this environment
    df = spark.range(500).withColumn("v", F.col("id") % 7)
    assert not tio.exists("t1")
    tio.write(df, "t1", lineage="test")
    assert tio.exists("t1")
    assert tio.read("t1").count() == 500


def test_tableio_overwrite_removes_stale_parts(spark, tmp_path):
    """createOrReplace semantics: rewriting a table with fewer partitions
    must not leave phantom rows from the previous version's part files."""
    tio = table_io.TableIO(spark, str(tmp_path / "tables_ovw"))
    big = spark.range(1000).withColumn("v", F.col("id") % 3).repartition(8)
    tio.write(big, "t")
    assert tio.read("t").count() == 1000
    small = spark.range(10).withColumn("v", F.col("id") % 3).repartition(2)
    tio.write(small, "t")
    assert tio.read("t").count() == 10  # no stale part-* from the 8-way write


def test_tableio_merge_upsert_fallback(spark, tmp_path):
    tio = table_io.TableIO(spark, str(tmp_path / "tables2"))
    base = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    tio.write(base.localCheckpoint(), "t", lineage="base")
    upd = spark.createDataFrame(pd.DataFrame({"k": [2, 4], "v": ["B", "D"]}))
    tio.merge_upsert(upd, "t", key="k")
    got = {r["k"]: r["v"] for r in tio.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}
