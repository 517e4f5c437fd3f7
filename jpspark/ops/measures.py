"""Geometry measure functions — the ST_Area / ST_Perimeter / ST_Centroid
/ ST_Length surface the reference's post-load SQL consumers use against
PostGIS (/root/reference/NOTES.md:100-133 consumption pattern), as
DataFrame column operators over the WKB geometry column. One
Arrow-batched kernel per row batch; no shuffle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import wkb

_MEASURES_SCHEMA = T.StructType(
    [
        T.StructField("area", T.DoubleType()),
        T.StructField("perimeter", T.DoubleType()),
        T.StructField("centroid_x", T.DoubleType()),
        T.StructField("centroid_y", T.DoubleType()),
    ]
)


def add_geom_measures(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Append area / perimeter / centroid_x / centroid_y for a
    multipolygon column (holes subtract from area and centroid weighting,
    add to perimeter — PostGIS semantics)."""

    @F.pandas_udf(_MEASURES_SCHEMA)
    def kernel(geoms: pd.Series) -> pd.DataFrame:
        a, p, cx, cy = [], [], [], []
        for g in geoms:
            buf = bytes(g)
            a.append(wkb.multipolygon_area(buf))
            p.append(wkb.multipolygon_perimeter(buf))
            x, y = wkb.multipolygon_centroid(buf)
            cx.append(x)
            cy.append(y)
        return pd.DataFrame(
            {"area": a, "perimeter": p, "centroid_x": cx, "centroid_y": cy}
        )

    m = kernel(F.col(geom_col))
    return (
        df.withColumn("area", m["area"])
        .withColumn("perimeter", m["perimeter"])
        .withColumn("centroid_x", m["centroid_x"])
        .withColumn("centroid_y", m["centroid_y"])
    )


def add_length(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Append ``length`` for a (multi)linestring column (ST_Length)."""

    @F.pandas_udf(T.DoubleType())
    def kernel(geoms: pd.Series) -> pd.Series:
        return pd.Series([wkb.multilinestring_length(bytes(g)) for g in geoms])

    return df.withColumn("length", kernel(F.col(geom_col)))
