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
    post_commit_hook=None,
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
    contract).

    ``post_commit_hook(epoch_id, manifest)`` fires after each epoch's
    manifest commit, BEFORE Spark records the batch as complete in the
    streaming checkpoint — the per-epoch metrics/alerting seam, and the
    crash window the exactly-once story must survive: a failure here (or
    anywhere earlier) leaves the batch un-acknowledged, so a restart
    REPLAYS it into the same epoch dir, where matching partition
    fingerprints absorb the rewrite (see
    tests/test_streaming_tableio.py kill-and-restart proof)."""
    from . import manifest as mf

    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        df = transform(batch_df) if transform is not None else batch_df
        epoch_dir = os.path.join(out_dir, f"epoch={epoch_id:08d}")
        m = mf.write_checkpointed(
            df, epoch_dir, lineage=f"stream epoch {epoch_id} from {source_dir}"
        )
        if post_commit_hook is not None:
            post_commit_hook(epoch_id, m)

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


SESSION_SCHEMA = (
    "user_id long, session_start string, session_end string, n_events long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize(
    events: DataFrame,
    gap_minutes: int = 60,
    watermark_delay: str = "1 minute",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful streaming operator (§2.7 'beyond the reference'):
    gap-based sessionization via ``applyInPandasWithState`` with
    event-time timeout.

    A session is a maximal run of a user's events with consecutive gaps
    <= gap_minutes. Sessions EMIT when they provably cannot grow: either
    a later in-batch event starts the next session, or the watermark
    passes last_ts + gap (event-time timeout). State per user is three
    longs (start, last, count) — bounded, skew-safe (hash-partitioned by
    user), and the 10^12-row shape: one shuffle on the group key, state
    store holds only open sessions.

    Timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings (UTC session)
    so batch oracles compare exactly.
    """
    import pandas as pd

    gap_ms = gap_minutes * 60_000

    def fn(key, pdfs, state):
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

        (user,) = key
        out_rows = []

        def emit(start_ms: int, last_ms: int, n: int):
            out_rows.append((int(user), int(start_ms), int(last_ms), int(n)))

        if state.hasTimedOut:
            start, last, n = state.get
            emit(start, last, n)
            state.remove()
        else:
            ts_all = []
            for pdf in pdfs:
                ts_all.append(pdf[ts_col])
            ts = (
                pd.concat(ts_all).sort_values().astype("int64") // 1_000_000
            )  # ns -> ms
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            for t in ts:
                t = int(t)
                if start is None:
                    start, last, n = t, t, 1
                elif t - last <= gap_ms:
                    # min(): a late-but-within-watermark event can extend a
                    # stored session backwards
                    start, last, n = min(start, t), max(last, t), n + 1
                else:
                    emit(start, last, n)  # closed by a later in-batch event
                    start, last, n = t, t, 1
            wm = state.getCurrentWatermarkMs()
            if last + gap_ms <= wm:
                emit(start, last, n)  # watermark already past: close now
                state.remove()
            else:
                state.update((int(start), int(last), int(n)))
                state.setTimeoutTimestamp(last + gap_ms)
        if out_rows:
            df = pd.DataFrame(out_rows, columns=["user_id", "s", "e", "n_events"])
            yield pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "session_start": pd.to_datetime(df["s"], unit="ms").dt.strftime(
                        "%Y-%m-%d %H:%M:%S"
                    ),
                    "session_end": pd.to_datetime(df["e"], unit="ms").dt.strftime(
                        "%Y-%m-%d %H:%M:%S"
                    ),
                    "n_events": df["n_events"],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
