"""Per-partition checkpoint manifest: lineage + row-count metrics +
idempotent resume (north_rule; SURVEY P10/S2/S13).

The reference's crash-safety idiom is *commit-marker-after-data*: the
``.meta.json`` sidecar is written only after the download completes
(/root/reference/src/downloader.rs:104), and ``--skip-if-exists`` probes
the target before re-running (/root/reference/src/loader/load_queue.rs:64-106,
gdal.rs:253-265). This module generalizes that to Spark partitions:

  * each task writes its partition to its own parquet file
    ``part-{pid:05d}.parquet`` (executor-side pyarrow write — the
    distributed COPY path),
  * the task emits a manifest row (partition_id, input fingerprint,
    row_count, bytes, output path, lineage) only after the file is fully
    written and fsync'd,
  * the driver persists ``_manifest.json`` only after ALL tasks succeed —
    a crash anywhere leaves either no manifest entry or a complete one,
    never a "valid" partial,
  * a re-run with the same target dir consults the manifest: partitions
    whose fingerprint is already committed are SKIPPED inside the task
    (zero I/O), giving idempotent per-partition resume.

Fingerprints are content-based (order-insensitive xxhash-style fold over
row hashes), so resume is correct even if Spark re-plans partitioning of
an unchanged input — a changed fingerprint simply re-writes that partition.

Storage backend: tasks write through a ``Storage`` seam (below). The
default ``LocalStorage`` uses plain ``os`` calls and therefore REQUIRES a
filesystem shared between driver and executors (true in local mode, NFS,
or a FUSE-mounted object store). On a real cluster, pass a Storage whose
``write_atomic``/``exists`` target the shared object store (e.g. s3/gs via
fsspec) — the commit protocol (data complete before visible, manifest
last) only needs those two primitives plus ``size``.

Snapshots (the Iceberg-shaped behaviors the north_star's 10^12-row table
relies on, without the Iceberg runtime): part files are content-addressed
(``part-{pid}-{fingerprint}.parquet``), every commit archives its manifest
as ``_manifests/manifest-{version}.json``, readers resolve EXACTLY the
files their manifest lists (never a glob — concurrent/failed writers
can't leak phantom rows), ``read_snapshot(version=...)`` time-travels,
and ``vacuum`` deletes files unreferenced by the kept snapshots.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark import TaskContext
from pyspark.sql import DataFrame

MANIFEST_NAME = "_manifest.json"
MANIFESTS_DIR = "_manifests"


class LocalStorage:
    """Default storage backend: local/shared POSIX filesystem.

    The three primitives the checkpoint protocol needs; swap this object
    for an object-store implementation (same signatures) on clusters
    without a shared FS. Must be picklable (it ships to executors).
    """

    def write_atomic(self, path: str, table: "pa.Table") -> None:
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic: data complete before visible

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)


def _fingerprint_pdf(pdf: pd.DataFrame) -> int:
    """Order-insensitive content fingerprint of a partition (uint64 as int).

    Per-row hash via pandas.util.hash_pandas_object (stable across runs),
    combined by addition (commutative) + count mixing.
    """
    if not len(pdf):
        return 0
    h = pd.util.hash_pandas_object(pdf, index=False).to_numpy().astype(np.uint64)
    total = np.uint64(0)
    for v in h:  # int64 overflow-safe fold
        total = np.uint64((int(total) + int(v)) & 0xFFFFFFFFFFFFFFFF)
    mix = (int(total) ^ (len(pdf) << 1)) & 0x7FFFFFFFFFFFFFFF
    return int(mix)


def load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"partitions": {}, "committed_at": None, "schema": None}


def write_checkpointed(
    df: DataFrame,
    out_dir: str,
    lineage: str = "",
    num_partitions: int | None = None,
    storage: "LocalStorage | None" = None,
) -> dict:
    """Write ``df`` to ``out_dir`` with per-partition commit semantics.

    Returns the manifest dict. Re-running on the same out_dir skips
    partitions whose content fingerprint is already committed (idempotent
    resume). Call again after a simulated crash and only missing/changed
    partitions are re-written.
    """
    store = storage or LocalStorage()
    os.makedirs(out_dir, exist_ok=True)
    prior = load_manifest(out_dir)
    committed = {
        int(pid): meta["fingerprint"]
        for pid, meta in prior.get("partitions", {}).items()
        if meta.get("status") == "committed"
    }
    spark = df.sparkSession
    bc_committed = spark.sparkContext.broadcast(committed)
    if num_partitions:
        df = df.repartition(num_partitions)
    arrow_schema = pa.Schema.from_pandas(df.limit(0).toPandas(), preserve_index=False)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        parts = [b for b in batches if len(b)]
        pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
        fp = _fingerprint_pdf(pdf)
        # content-addressed: a changed partition writes a NEW file, the
        # old one stays referenced by the previous snapshot (time travel)
        path = os.path.join(out_dir, f"part-{pid:05d}-{fp:016x}.parquet")
        skipped = bc_committed.value.get(pid) == fp and store.exists(path)
        if not skipped:
            table = (
                pa.Table.from_pandas(pdf, preserve_index=False)
                if len(pdf)
                else arrow_schema.empty_table()
            )
            store.write_atomic(path, table)
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "fingerprint": [fp],
                "row_count": [len(pdf)],
                "bytes": [store.size(path)],
                "path": [path],
                "skipped": [skipped],
            }
        )

    stats_schema = (
        "partition_id int, fingerprint long, row_count long, bytes long, "
        "path string, skipped boolean"
    )
    stats = df.mapInPandas(sink, stats_schema).collect()

    manifest = {
        "version": int(prior.get("version", 0)) + 1,
        "lineage": lineage,
        "schema": df.schema.simpleString(),
        "committed_at": time.time(),
        "total_rows": int(sum(r.row_count for r in stats)),
        "partitions": {
            str(r.partition_id): {
                "fingerprint": int(r.fingerprint),
                "row_count": int(r.row_count),
                "bytes": int(r.bytes),
                "path": r.path,
                "status": "committed",
                "skipped_on_last_run": bool(r.skipped),
            }
            for r in stats
        },
    }
    # snapshot commit order: archived copy first, then the latest pointer
    # (a crash between the two leaves a readable previous state)
    os.makedirs(os.path.join(out_dir, MANIFESTS_DIR), exist_ok=True)
    archived = os.path.join(
        out_dir, MANIFESTS_DIR, f"manifest-{manifest['version']:06d}.json"
    )
    for target in (archived, os.path.join(out_dir, MANIFEST_NAME)):
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, ensure_ascii=False, indent=1)
        os.replace(tmp, target)
    return manifest


def read_snapshot(spark, out_dir: str, version: int | None = None) -> "DataFrame":
    """Read exactly the part files a snapshot's manifest lists (never a
    glob — stale/orphaned files from replaced table versions can't leak
    phantom rows). ``version=None`` reads the latest commit; an integer
    time-travels to that archived snapshot."""
    if version is None:
        m = load_manifest(out_dir)
    else:
        path = os.path.join(out_dir, MANIFESTS_DIR, f"manifest-{version:06d}.json")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no snapshot version {version} under {out_dir}")
        with open(path) as f:
            m = json.load(f)
    paths = [meta["path"] for meta in m.get("partitions", {}).values()]
    if not paths:
        raise ValueError(f"snapshot has no committed partitions: {out_dir} v{version}")
    return spark.read.parquet(*paths)


def snapshots(out_dir: str) -> list[dict]:
    """All archived snapshots, oldest first: version/committed_at/rows."""
    d = os.path.join(out_dir, MANIFESTS_DIR)
    out = []
    for fname in sorted(os.listdir(d)) if os.path.isdir(d) else []:
        if fname.startswith("manifest-") and fname.endswith(".json"):
            with open(os.path.join(d, fname)) as f:
                m = json.load(f)
            out.append(
                {
                    "version": m.get("version"),
                    "committed_at": m.get("committed_at"),
                    "total_rows": m.get("total_rows"),
                    "lineage": m.get("lineage"),
                }
            )
    return out


def compact(spark, out_dir: str, target_bytes: int = 128 << 20, storage=None) -> dict:
    """Small-files compaction (Iceberg ``rewrite_data_files`` analog):
    read the current snapshot, rewrite it into partitions sized to
    ~``target_bytes`` (estimated from the manifest's measured bytes/row),
    and commit as a NEW snapshot. The replaced snapshot stays readable
    via time travel until ``vacuum`` expires it — compaction is just
    another commit, never an in-place mutation."""
    m = load_manifest(out_dir)
    parts = m.get("partitions", {})
    if not parts:
        raise ValueError(f"nothing to compact: no committed snapshot under {out_dir}")
    total_bytes = sum(int(p["bytes"]) for p in parts.values())
    n_parts = max(1, round(total_bytes / target_bytes))
    df = read_snapshot(spark, out_dir)
    return write_checkpointed(
        df,
        out_dir,
        lineage=f"compact v{m.get('version')} ({len(parts)} -> {n_parts} files)",
        num_partitions=n_parts,
        storage=storage,
    )


def vacuum(out_dir: str, keep_last: int = 1) -> dict:
    """Expire old snapshots: keep the newest ``keep_last`` manifests,
    delete part files referenced by none of them, drop expired manifest
    archives. Returns {kept_versions, removed_files, removed_snapshots}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest snapshot must survive)")
    d = os.path.join(out_dir, MANIFESTS_DIR)
    names = sorted(
        f for f in (os.listdir(d) if os.path.isdir(d) else [])
        if f.startswith("manifest-") and f.endswith(".json")
    )
    keep, expire = names[-keep_last:], names[:-keep_last]
    referenced: set[str] = set()
    kept_versions = []
    for fname in keep:
        with open(os.path.join(d, fname)) as f:
            m = json.load(f)
        kept_versions.append(m.get("version"))
        referenced |= {meta["path"] for meta in m.get("partitions", {}).values()}
    removed_files = 0
    for fname in os.listdir(out_dir):
        full = os.path.join(out_dir, fname)
        if fname.startswith("part-") and fname.endswith(".parquet") and full not in referenced:
            os.remove(full)
            removed_files += 1
    for fname in expire:
        os.remove(os.path.join(d, fname))
    return {
        "kept_versions": kept_versions,
        "removed_files": removed_files,
        "removed_snapshots": len(expire),
    }


def simulate_partition_loss(out_dir: str, partition_id: int) -> None:
    """Test helper: delete one partition's data file + manifest entry,
    as if its task died before commit."""
    m = load_manifest(out_dir)
    meta = m["partitions"].pop(str(partition_id), None)
    if meta and os.path.exists(meta["path"]):
        os.remove(meta["path"])
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(m, f)


def observe_metrics(df: DataFrame, name: str = "metrics"):
    """Attach row-count/sum accumulators via df.observe — the engine's
    analog of the reference's progress counters
    (/root/reference/src/loader/load_queue.rs:273-283)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs
