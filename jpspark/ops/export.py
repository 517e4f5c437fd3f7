"""File-export sinks (SURVEY S9): GeoParquet-minimal and GeoJSON.

The reference shells ``ogr2ogr -f GeoParquet|GeoJSON|FlatGeobuf``
(/root/reference/src/loader/gdal.rs:143-167) and deletes pre-existing
output first (gdal.rs:144-148 -> mode("overwrite")). Spark-first:

- GeoParquet-minimal: a plain parquet write with the WKB geometry column
  plus the ``geo`` file-level metadata sidecar (version/primary_column/
  crs), which is what "GeoParquet" is at rest. Readers that understand
  full GeoParquet metadata embedding can be layered on; the data layout
  is already columnar WKB.
- GeoJSON: newline-delimited Feature objects (RFC 7946 geometries decoded
  from WKB in an Arrow-batched kernel), written with the JSON sink.
- FlatGeobuf: not implemented — it is a single-file spatially-indexed
  format that contradicts distributed sharded writes; documented gap.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geom import wkb


def write_geoparquet(
    df: DataFrame, path: str, geom_col: str = "geom", srid: int = 6668, mode: str = "overwrite"
) -> None:
    """Overwrite-semantics parquet export + `_geo.json` sidecar carrying
    the geometry metadata the reference records in its catalog
    (geometry column name, type, srid)."""
    df.write.mode(mode).parquet(path)
    sidecar = {
        "version": "jpspark-geoparquet-minimal",
        "primary_column": geom_col,
        "columns": {geom_col: {"encoding": "WKB", "crs": f"EPSG:{srid}"}},
    }
    with open(os.path.join(path, "_geo.json"), "w") as f:
        json.dump(sidecar, f)


def _wkb_to_geojson_geometry(buf: bytes) -> dict:
    gtype, payload = wkb.parse(bytes(buf))
    if gtype == wkb.POINT:
        return {"type": "Point", "coordinates": payload.tolist()}
    if gtype == wkb.MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": payload.tolist()}
    if gtype == wkb.LINESTRING:
        return {"type": "LineString", "coordinates": payload.tolist()}
    if gtype == wkb.MULTILINESTRING:
        return {"type": "MultiLineString", "coordinates": [p.tolist() for p in payload]}
    if gtype == wkb.POLYGON:
        return {"type": "Polygon", "coordinates": [r.tolist() for r in payload]}
    if gtype == wkb.MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in rings] for rings in payload],
        }
    raise ValueError(f"unsupported geometry type {gtype}")


def to_geojson_features(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """One GeoJSON Feature string per row (distributed kernel); write with
    ``.write.text(path)`` for newline-delimited GeoJSON."""
    props = [c for c in df.columns if c != geom_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            geoms = pdf[geom_col].to_numpy()
            prop_cols = [pdf[c].to_numpy() for c in props]
            for i, g in enumerate(geoms):
                feats.append(
                    json.dumps(
                        {
                            "type": "Feature",
                            "geometry": _wkb_to_geojson_geometry(g),
                            "properties": {
                                c: (None if (isinstance(v, float) and np.isnan(v)) else v)
                                for c, v in zip(props, (col[i] for col in prop_cols))
                            },
                        },
                        ensure_ascii=False,
                        default=str,
                    )
                )
            yield pd.DataFrame({"feature": feats})

    return df.mapInPandas(kernel, "feature string")


def write_geojson(df: DataFrame, path: str, geom_col: str = "geom") -> None:
    to_geojson_features(df, geom_col).write.mode("overwrite").text(path)
