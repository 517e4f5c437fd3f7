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
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def shapefile_pairs(
    extracted: DataFrame, entry_col: str = "entry", content_col: str = "content"
) -> DataFrame:
    """Group sibling shapefile members (.shp/.dbf/.cpg) by path stem —
    one row per layer, ``files`` = map<ext, bytes>."""
    e = (
        extracted.withColumn(
            "ext", F.lower(F.regexp_extract(F.col(entry_col), r"\.([A-Za-z0-9]+)$", 1))
        )
        .filter(F.col("ext").isin("shp", "dbf", "cpg"))
        .withColumn(
            "stem",
            F.expr(f"substring({entry_col}, 1, length({entry_col}) - length(ext) - 1)"),
        )
    )
    return e.groupBy("stem").agg(
        F.map_from_entries(F.collect_list(F.struct("ext", F.col(content_col)))).alias("files")
    )


def shapefile_scan(
    extracted: DataFrame, encoding: str | None = None
) -> DataFrame:
    """S5: distributed shapefile source with schema inference — the
    engine-native replacement for the reference's ``ogrinfo``/``ogr2ogr``
    shell-outs (/root/reference/src/loader/gdal.rs:169-212).

    Schema comes from the FIRST layer's .dbf field descriptors (driver-side
    single-row probe — types are declared in the descriptor, not sniffed
    from data): C/D->string, N(dec=0)->long, N(dec>0)/F->double,
    L->boolean. Each layer is then parsed in a mapInPandas kernel
    (codec/shp.py, no native deps): .dbf attributes + .shp geometries
    paired by record order, geometry promoted to MULTI (F9 parity with
    ``-nlt PROMOTE_TO_MULTI``). Character encoding: explicit arg > .cpg
    sidecar > CP932-first detect chain (gdal.rs:337-356 parity).

    Output: (source stem, fid, <dbf columns>, geom WKB binary).
    """
    from pyspark.sql import types as T

    from ..codec import shp as shp_codec
    from ..geom import wkb

    pairs = shapefile_pairs(extracted)
    first = pairs.limit(1).collect()
    if not first:
        raise ValueError("shapefile_scan: no .shp/.dbf members in input")
    files0 = dict(first[0]["files"])
    if "dbf" not in files0:
        raise ValueError("shapefile_scan: first layer has no .dbf sidecar")
    fields = shp_codec.parse_dbf_fields(bytes(files0["dbf"]))
    # (name, dbf type, decimal count) signature every layer must match
    expected_fields = [(n, t, d) for n, t, _l, d in fields]
    attr_fields = []
    for name, ftype, _flen, fdec in fields:
        if ftype in ("N", "F"):
            t = T.DoubleType() if (ftype == "F" or fdec > 0) else T.LongType()
        elif ftype == "L":
            t = T.BooleanType()
        else:
            t = T.StringType()
        attr_fields.append(T.StructField(name, t))
    out_schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("fid", T.LongType()),
            *attr_fields,
            T.StructField("geom", T.BinaryType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for stem, files in zip(pdf["stem"].to_numpy(), pdf["files"].to_numpy()):
                f = dict(files)
                enc = encoding
                if enc is None and f.get("cpg"):
                    enc = bytes(f["cpg"]).decode("ascii", "replace").strip().lower() or None
                # every layer must match the probed schema exactly — a layer
                # with a different field set would otherwise be silently
                # reindexed (extra columns dropped, missing ones nulled)
                # instead of erroring (round-3 ADVICE; mirrors the
                # .shp/.dbf record-count check below)
                layer_fields = [
                    (n, t, d) for n, t, _l, d in shp_codec.parse_dbf_fields(bytes(f["dbf"]))
                ]
                if layer_fields != expected_fields:
                    raise ValueError(
                        f"{stem}: .dbf schema {layer_fields} does not match the "
                        f"probed first-layer schema {expected_fields} — layers of "
                        "one scan must share a field set (split the scan, or map "
                        "schemas per layer before union)"
                    )
                attrs = shp_codec.parse_dbf(bytes(f["dbf"]), encoding=enc)
                geoms = shp_codec.parse_shp(bytes(f["shp"]))
                if len(attrs) != len(geoms):
                    raise ValueError(
                        f"{stem}: .dbf has {len(attrs)} records but .shp has {len(geoms)}"
                    )
                gdf = pd.DataFrame(
                    {
                        "fid": [int(r) for r, _ in geoms],
                        "geom": [wkb.promote_to_multi(b) if b is not None else None
                                 for _, b in geoms],
                    }
                )
                rec = pd.concat([attrs.reset_index(drop=True), gdf], axis=1)
                rec.insert(0, "source", stem)
                frames.append(rec)
            out = (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(columns=out_cols)
            )
            yield out.reindex(columns=out_cols)

    return pairs.mapInPandas(kernel, out_schema)


def crosswalk_from_xlsx(spark: SparkSession, buf: bytes) -> DataFrame:
    """S7: crosswalk scan from actual AdminiBoundary_CD.xlsx bytes — the
    engine-native replacement for the reference's calamine parse
    (/root/reference/src/loader/admini_boundary.rs:26-63): sheet
    行政区域コード, header-sentinel scan start (P9), NFKC (F1),
    empty->NULL + all-NULL-row drop (P8), then first-wins dedup on the
    code — ON CONFLICT DO NOTHING parity (S10, admini_boundary.rs:97-99).
    Parse is driver-side (the file is tiny, per SURVEY §2.1); the
    returned DataFrame is the distributed surface."""
    from ..catalog import CROSSWALK_COLUMNS
    from ..codec import xlsx as xlsx_codec

    rows = xlsx_codec.crosswalk_rows(buf)
    pdf = pd.DataFrame(rows, columns=CROSSWALK_COLUMNS)
    # ON CONFLICT (行政区域コード) DO NOTHING == first row in file order
    # wins; sequential-insert parity requires the file-order dedup here,
    # before the rows reach any distributed (unordered) stage
    pdf = pdf.drop_duplicates(subset=[CROSSWALK_COLUMNS[0]], keep="first")
    # Explicit all-varchar schema: the reference declares every crosswalk
    # column as varchar (/root/reference/data/schema.sql:3-15), and an
    # all-None object column (政令市・郡・支庁… is empty in many files)
    # breaks plain type inference under a non-Arrow createDataFrame path.
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in CROSSWALK_COLUMNS]
    )
    return spark.createDataFrame(pdf, schema=schema)


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
