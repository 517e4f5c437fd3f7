"""Multi-source schema-merging union — the VRT union layer (SURVEY S6/U1).

The reference fuses N per-prefecture shapefiles into one logical layer via
an OGR VRT with per-layer field projections and per-layer source encodings
(/root/reference/src/loader/gdal.rs:38-111): layers contributing no mapped
field are dropped (gdal.rs:70-72), missing fields NULL-fill (union layer
semantics, gdal.rs:95-104).

Spark equivalent: per-source decode (encoding try-chain F2) + field-mapping
projection (P6) + ``unionByName(allowMissingColumns=True)`` fold. The fold
is left-deep but Catalyst flattens it into one Union node — one scan per
source, no repeated shuffles.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .mapping import ShapefileMapping, apply_field_mapping
from .text import decode_binary_udf, detect_encoding


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """U1: N-way union with NULL-fill for missing columns."""
    if not dfs:
        raise ValueError("no sources")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def union_mapped_sources(sources: list[DataFrame], mapping: ShapefileMapping) -> DataFrame:
    """S6: apply the field mapping per source, drop sources contributing no
    mapped field (gdal.rs:70-72), then union-by-name."""
    mapped = []
    for df in sources:
        m = apply_field_mapping(df, mapping)
        if m.columns:
            mapped.append(m)
    return union_by_name(mapped)


def decode_sources(
    spark: SparkSession,
    raw_sources: list[pd.DataFrame],
    sample_rows: int = 100,
) -> list[DataFrame]:
    """F2: per-source encoding normalization. Each raw source is a pandas
    frame of *encoded bytes* columns (shapefile DBF analog) with an
    optional declared encoding in .attrs; undeclared sources get the
    CP932-first decode try-chain over the first ``sample_rows`` rows
    (mirrors ogrinfo SOURCE_ENCODING then the -limit 100 sample,
    gdal.rs:326-408). Decode itself runs distributed via pandas UDF."""
    out = []
    for pdf in raw_sources:
        declared = pdf.attrs.get("declared_encoding")
        if declared is None:
            samples = [
                bytes(v)
                for col in pdf.columns
                for v in pdf[col].head(sample_rows)
                if isinstance(v, (bytes, bytearray))
            ]
            declared = detect_encoding(samples)
        sdf = spark.createDataFrame(pdf)
        dec = decode_binary_udf(declared)
        for c in sdf.columns:
            sdf = sdf.withColumn(c, dec(sdf[c]))
        out.append(sdf)
    return out
