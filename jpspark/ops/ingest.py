"""Distributed archive ingest — ZIP traversal as a Spark operator (S2/S3).

The reference downloads dataset ZIPs (15 concurrent slots,
/root/reference/src/scraper/download_queue.rs:11) and recursively extracts
shapefile members, including ZIPs nested inside ZIPs
(/root/reference/src/loader/zip_traversal.rs:11-48). Our engine reads
archives with ``spark.read.format("binaryFile")`` and runs the recursive
traversal in a ``mapInPandas`` kernel — one archive per task row, stdlib
``zipfile`` over an in-memory buffer, name-regex filtering and the
known-bad-prefix skip applied inside the kernel (distributed, no driver
bottleneck). Parallelism is the number of archive files; the reference's
15-slot queue becomes ``repartition(n_slots)`` on the manifest.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .mapping import CATCH_ALL, ShapefileMapping, template_to_regex

KNOWN_BAD_PREFIX = "N08-21_GML/utf8/"  # zip_traversal.rs:38-41


def extract_zip_bytes(
    buf: bytes, matchers: list[re.Pattern], _prefix: str = ""
) -> list[tuple[str, bytes]]:
    """Recursive extraction (zip_traversal.rs:11-48): returns
    (normalized entry path, content bytes) for entries matching any
    matcher; nested .zip entries are recursed into with their path as
    prefix. Backslashes normalized (rs:25); known-bad prefix skipped."""
    out: list[tuple[str, bytes]] = []
    with zipfile.ZipFile(io.BytesIO(buf)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = info.filename.replace("\\", "/")
            full = f"{_prefix}{name}"
            if full.startswith(KNOWN_BAD_PREFIX) or f"/{KNOWN_BAD_PREFIX}" in f"/{full}":
                continue
            if name.lower().endswith(".zip"):
                out.extend(extract_zip_bytes(zf.read(info), matchers, _prefix=f"{full}/"))
            elif any(m.search(full) for m in matchers):
                out.append((full, zf.read(info)))
    return out


def extract_archives(
    archives: DataFrame,
    mapping: ShapefileMapping,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Distributed S3+S4: extract matching members from each archive row.
    Two-pass fallback widening (zip_traversal.rs:84-96) happens per archive
    inside the kernel: strict matchers first, catch-all if none hit."""
    strict = [re.compile(template_to_regex(t)) for t in mapping.shapefile_name_templates]
    loose = [re.compile(CATCH_ALL)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col].to_numpy(), pdf[content_col].to_numpy()):
                members = extract_zip_bytes(bytes(content), strict)
                if not members:
                    members = extract_zip_bytes(bytes(content), loose)
                for entry, data in members:
                    rows.append((path, entry, data, len(data)))
            yield pd.DataFrame(
                rows, columns=["archive", "entry", "content", "size"]
            ) if rows else pd.DataFrame(
                {"archive": pd.Series(dtype=object), "entry": pd.Series(dtype=object),
                 "content": pd.Series(dtype=object), "size": pd.Series(dtype="int64")}
            )

    return archives.select(path_col, content_col).mapInPandas(
        kernel, "archive string, entry string, content binary, size long"
    )


def read_archives(spark: SparkSession, glob_path: str, n_slots: int = 15) -> DataFrame:
    """S2 analog: archive manifest scan. ``binaryFile`` gives (path,
    modificationTime, length, content); repartition to the reference's
    download-slot parallelism."""
    return (
        spark.read.format("binaryFile")
        .load(glob_path)
        .select("path", "content")
        .repartition(n_slots)
    )
