"""Streaming micro-batch ingest + TableIO seam."""

from __future__ import annotations

import os
import time

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
    # coalesce(1): each drop must appear ATOMICALLY to the running
    # stream's own triggers — a multi-part write can be half-listed by a
    # trigger landing mid-write, committing a prefix as its own epoch
    spark.range(100).withColumn("v", F.col("id") * 1.0).coalesce(1).write.parquet(src + "/f1.parquet")
    q = streaming.stream_ingest(spark, src, out, schema)
    q.processAllAvailable()
    # second drop while the stream is live
    spark.range(100, 250).withColumn("v", F.col("id") * 1.0).coalesce(1).write.parquet(src + "/f2.parquet")
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


def test_stream_kill_and_restart_exactly_once(spark, tmp_path):
    """Exactly-once durability proof (round-4 VERDICT #8): crash a
    foreachBatch stream AFTER an epoch's manifest commit but BEFORE
    Spark acknowledges the batch — the worst-case window, where the data
    is durable but the source offset is not. The restarted stream must
    REPLAY that batch from the checkpoint, and the manifest's partition
    fingerprints must absorb the replay (skip, not duplicate), yielding
    a bit-identical final table."""
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "ingested")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    committed_epochs = []

    def crash_after_second_commit(epoch_id, manifest):
        committed_epochs.append(epoch_id)
        if len(committed_epochs) == 2:
            raise RuntimeError("injected crash: died before batch ack")

    spark.range(100).withColumn("v", F.col("id") * 1.0).write.parquet(src + "/f1.parquet")
    q = streaming.stream_ingest(
        spark, src, out, schema, post_commit_hook=crash_after_second_commit
    )
    q.processAllAvailable()
    assert committed_epochs == [0]
    # second drop triggers the injected crash post-commit, pre-ack
    spark.range(100, 250).withColumn("v", F.col("id") * 1.0).coalesce(1).write.parquet(src + "/f2.parquet")
    with pytest.raises(Exception, match="injected crash"):
        q.processAllAvailable()
        q.awaitTermination()
    # the failing micro-batch thread tears the query down asynchronously;
    # under host load the isActive flip can lag the raised exception
    for _ in range(200):
        if not q.isActive:
            break
        time.sleep(0.05)
    assert not q.isActive
    # the epoch-1 data IS committed (durable) but the batch is unacked
    from jpspark.manifest import load_manifest

    m1 = load_manifest(os.path.join(out, "epoch=00000001"))
    assert sum(int(p["row_count"]) for p in m1["partitions"].values()) == 150

    # restart from the same checkpoint: batch 1 replays and is absorbed
    q2 = streaming.stream_ingest(spark, src, out, schema)
    q2.processAllAvailable()
    # third drop proves the stream is healthy after recovery
    spark.range(250, 300).withColumn("v", F.col("id") * 1.0).coalesce(1).write.parquet(src + "/f3.parquet")
    q2.processAllAvailable()
    q2.stop()

    m1b = load_manifest(os.path.join(out, "epoch=00000001"))
    assert all(p["skipped_on_last_run"] for p in m1b["partitions"].values())
    assert {p["fingerprint"] for p in m1b["partitions"].values()} == {
        p["fingerprint"] for p in m1["partitions"].values()
    }
    back = streaming.read_ingested(spark, out)
    assert back.count() == 300  # no duplicates from the replay
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(300))


def test_sessionize_stateful_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: in-batch gap splits AND
    event-time-timeout closure (flushed by a far-future sentinel batch)."""
    import glob
    import shutil
    import time

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [(1, base + pd.Timedelta(minutes=m)) for m in (0, 30, 50, 200, 210)]
    rows.append((2, base))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(tmp_path / "b1"))
    f1 = str(in_dir / "000_events.parquet")
    shutil.copy(glob.glob(str(tmp_path / "b1" / "part-*.parquet"))[0], f1)
    sent = pd.DataFrame([(99, base + pd.Timedelta(days=10))], columns=["user_id", "ts"])
    spark.createDataFrame(sent).coalesce(1).write.parquet(str(tmp_path / "b2"))
    f2 = str(in_dir / "999_sentinel.parquet")
    shutil.copy(glob.glob(str(tmp_path / "b2" / "part-*.parquet"))[0], f2)
    now = time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now + 100, now + 100))

    schema = spark.read.parquet(f1).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sess = streaming.sessionize(stream, gap_minutes=60, watermark_delay="1 minute")
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_unit")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = (
        spark.table("sess_unit")
        .filter("user_id < 99")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:50:00", 3),
        (1, "2024-01-01 03:20:00", "2024-01-01 03:30:00", 2),
        (2, "2024-01-01 00:00:00", "2024-01-01 00:00:00", 1),
    ]


def test_tableio_parquet_fallback(spark, tmp_path):
    tio = table_io.TableIO(spark, str(tmp_path / "tables"))
    assert tio.catalog is None  # no Iceberg jar in this environment
    df = spark.range(500).withColumn("v", F.col("id") % 7)
    assert not tio.exists("t1")
    tio.write(df, "t1", lineage="test")
    assert tio.exists("t1")
    assert tio.read("t1").count() == 500


def test_tableio_overwrite_snapshots_and_time_travel(spark, tmp_path):
    """createOrReplace semantics: a shrinking rewrite returns only the new
    rows (manifest-listed reads, no phantom part files); the replaced
    version stays readable via time travel until vacuumed."""
    tio = table_io.TableIO(spark, str(tmp_path / "tables_ovw"))
    big = spark.range(1000).withColumn("v", F.col("id") % 3).repartition(8)
    tio.write(big, "t")
    assert tio.read("t").count() == 1000
    small = spark.range(10).withColumn("v", F.col("id") % 3).repartition(2)
    tio.write(small, "t")
    assert tio.read("t").count() == 10  # no stale rows from the 8-way write
    # time travel: version 1 is the 1000-row table
    snaps = tio.snapshots("t")
    assert [s["version"] for s in snaps] == [1, 2]
    assert tio.read("t", version=1).count() == 1000
    # vacuum keeps the newest snapshot only; old data files are removed
    res = tio.vacuum("t", keep_last=1, grace_seconds=0)
    assert res["kept_versions"] == [2] and res["removed_snapshots"] == 1
    assert res["removed_files"] >= 8
    assert tio.read("t").count() == 10
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        tio.read("t", version=1)


def test_tableio_compact_small_files(spark, tmp_path):
    """Compaction rewrites many small files into few, as a new snapshot:
    rows identical, old snapshot time-travelable until vacuumed."""
    import os

    tio = table_io.TableIO(spark, str(tmp_path / "tables_cmp"))
    df = spark.range(50_000).withColumn("v", F.col("id") % 7).repartition(16)
    tio.write(df, "t")
    d = str(tmp_path / "tables_cmp" / "t")
    n_before = len([f for f in os.listdir(d) if f.startswith("part-")])
    assert n_before == 16
    total = sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d) if f.startswith("part-")
    )
    m = tio.compact("t", target_bytes=total // 2)  # -> ~2 files
    assert m["version"] == 2
    assert len(m["partitions"]) <= 4
    got = tio.read("t")
    assert got.count() == 50_000
    assert got.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    assert tio.read("t", version=1).count() == 50_000  # old snapshot intact
    res = tio.vacuum("t", keep_last=1, grace_seconds=0)
    assert res["removed_files"] >= 16


def test_tableio_merge_upsert_fallback(spark, tmp_path):
    tio = table_io.TableIO(spark, str(tmp_path / "tables2"))
    base = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    tio.write(base.localCheckpoint(), "t", lineage="base")
    upd = spark.createDataFrame(pd.DataFrame({"k": [2, 4], "v": ["B", "D"]}))
    tio.merge_upsert(upd, "t", key="k")
    got = {r["k"]: r["v"] for r in tio.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_sql_predicate_rendering():
    """Round-3 ADVICE: the Iceberg-catalog DELETE path must render SQL
    literals, not Python reprs — 'in' as a parenthesized tuple, strings
    quote-escaped so they can't break or inject into the statement."""
    from jpspark.table_io import _sql_predicate

    assert _sql_predicate("k", "in", [1, 2]) == "k IN (1, 2)"
    assert _sql_predicate("name", "=", "o'hara") == "name = 'o''hara'"
    assert (
        _sql_predicate("name", "=", "x' OR '1'='1")
        == "name = 'x'' OR ''1''=''1'"
    )
    assert _sql_predicate("v", ">=", 2.5) == "v >= 2.5"
    # Spark's lexer honors backslash escapes: \ doubles first, so a
    # trailing backslash can't eat the closing quote and \' can't
    # re-open the string (round-4 review finding)
    assert _sql_predicate("name", "=", "a\\") == "name = 'a\\\\'"
    assert (
        _sql_predicate("name", "=", "\\' OR 1=1 --")
        == "name = '\\\\'' OR 1=1 --'"
    )
    assert _sql_predicate("b", "=", True) == "b = TRUE"
    assert _sql_predicate("n", "=", None) == "n = NULL"
    import pytest as _pt

    with _pt.raises(ValueError, match="identifier"):
        _sql_predicate("k; DROP TABLE x", "=", 1)
    with _pt.raises(ValueError, match="op"):
        _sql_predicate("k", "like", "x")
