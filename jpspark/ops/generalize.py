"""Geometry generalization operators (cartographic simplification).

The reference's tile exports lean on tippecanoe's built-in
simplification (/root/reference/NOTES.md:118-133); here it is a
first-class DataFrame op so any layer can be generalized before
export/join — per-row Douglas–Peucker over the WKB geometry column in an
Arrow-batched kernel. Embarrassingly parallel (no shuffle); vertices of
the output are a subset of the input, so downstream equality/PIP
comparisons on retained vertices stay bit-exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import simplify as simp
from ..geom import wkb


def simplify_geoms(df: DataFrame, tol: float, geom_col: str = "geom") -> DataFrame:
    """Replace ``geom_col`` with its DP-simplified form; adds
    ``n_vertices_in``/``n_vertices_out`` audit columns (the generalization
    ratio a tile pipeline monitors)."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("geom", T.BinaryType()),
                T.StructField("n_vertices_in", T.IntegerType()),
                T.StructField("n_vertices_out", T.IntegerType()),
            ]
        )
    )
    def kernel(geoms: pd.Series) -> pd.DataFrame:
        outs, nin, nout = [], [], []
        for g in geoms:
            buf = bytes(g)
            nin.append(sum(len(r) for p in wkb.parse_multipolygon(buf) for r in p))
            s = simp.simplify_multipolygon(buf, tol)
            nout.append(sum(len(r) for p in wkb.parse_multipolygon(s) for r in p))
            outs.append(s)
        return pd.DataFrame(
            {"geom": outs, "n_vertices_in": nin, "n_vertices_out": nout}
        )

    tmp = df.withColumn("_s", kernel(F.col(geom_col)))
    return (
        tmp.drop(geom_col)
        .withColumn(geom_col, F.col("_s.geom"))
        .withColumn("n_vertices_in", F.col("_s.n_vertices_in"))
        .withColumn("n_vertices_out", F.col("_s.n_vertices_out"))
        .drop("_s")
    )
