"""FlatGeobuf sink: wire-format round trips (builder + reader), Hilbert
ordering determinism, and end-to-end write->parse on the fixture layers.

Closes SURVEY S9 against the reference's ogr2ogr -f FlatGeobuf path
(/root/reference/src/loader/gdal.rs:143-167)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from jpspark import fixtures as fx
from jpspark.codec import fgb
from jpspark.codec import flatbuf as fb
from jpspark.geom import wkb
from jpspark.ops import export


def test_flatbuf_builder_reader_roundtrip():
    b = fb.Builder()
    s_off = b.create_string("こんにちは")
    v_off = b.create_scalar_vector("float64", [1.5, 2.5, 3.5])
    b.start_table()
    b.add_offset(0, s_off)
    b.add_scalar(1, "uint8", 7, default=0)
    b.add_offset(2, v_off)
    b.add_scalar(3, "uint64", 123456789012345, default=0)
    b.add_scalar(4, "uint16", 0, default=16)  # non-default explicit write
    root = b.end_table()
    data = b.finish(root, size_prefixed=True)
    (size,) = struct.unpack_from("<I", data, 0)
    assert size == len(data) - 4
    t = fb.root_table(data, size_prefixed=True)
    assert t.string(0) == "こんにちは"
    assert t.scalar(1, "uint8", 0) == 7
    assert t.scalar_vector(2, "float64") == [1.5, 2.5, 3.5]
    assert t.scalar(3, "uint64", 0) == 123456789012345
    assert t.scalar(4, "uint16", 16) == 0
    assert t.scalar(9, "uint16", 16) == 16  # absent slot -> default


def test_flatbuf_alignment():
    """Scalars must land on size-aligned file positions (spec requirement
    for zero-copy readers)."""
    b = fb.Builder()
    b.start_table()
    b.add_scalar(0, "uint8", 1, default=0)
    b.add_scalar(1, "float64", 2.0, default=0.0)
    root = b.end_table()
    data = b.finish(root)
    t = fb.root_table(data)
    f64_pos = t._field(1)
    assert f64_pos % 8 == 0
    assert t.scalar(1, "float64", 0.0) == 2.0


def test_hilbert_locality_and_determinism():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (500, 2))
    bboxes = np.hstack([pts, pts])
    o1 = fgb.hilbert_order(bboxes)
    o2 = fgb.hilbert_order(bboxes)
    assert np.array_equal(o1, o2)
    # locality: mean step distance along the Hilbert order is much smaller
    # than between random consecutive points
    ordered = pts[o1]
    step = np.linalg.norm(np.diff(ordered, axis=0), axis=1).mean()
    rand_step = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert step < rand_step / 3


def test_fgb_roundtrip_multipolygon_layer(spark, tmp_path):
    polys = fx.admin_polygons(12)
    sdf = spark.createDataFrame(polys)
    path = str(tmp_path / "admin.fgb")
    meta = export.write_flatgeobuf(sdf, path, layer_name="admin", srid=6668)
    assert meta["features_count"] == 12

    with open(path, "rb") as f:
        assert f.read(8) == fgb.MAGIC

    out = export.read_flatgeobuf(path)
    assert out["name"] == "admin"
    assert out["geometry_type"] == fgb.GT_MULTIPOLYGON
    assert out["features_count"] == 12
    assert len(out["features"]) == 12
    assert out["crs_code"] == 6668
    assert [c[0] for c in out["columns"]] == [
        "ogc_fid", "都道府県名", "市区町村名", "全国地方公共団体コード"
    ]

    # per-feature parity: match features back by ogc_fid, compare every
    # ring vertex bit-for-bit and every property value
    by_fid = {f["properties"]["ogc_fid"]: f for f in out["features"]}
    for _, row in polys.iterrows():
        f = by_fid[row["ogc_fid"]]
        assert f["properties"]["市区町村名"] == row["市区町村名"]
        assert f["properties"]["全国地方公共団体コード"] == row["全国地方公共団体コード"]
        orig = wkb.parse_multipolygon(row["geom"])
        got = f["geometry"]
        assert got["type"] == fgb.GT_MULTIPOLYGON
        assert len(got["parts"]) == len(orig)
        for part, rings in zip(got["parts"], orig):
            assert part["type"] == fgb.GT_POLYGON
            assert len(part["rings"]) == len(rings)
            for got_ring, orig_ring in zip(part["rings"], rings):
                assert np.array_equal(got_ring, orig_ring)

    # envelope covers the exact bbox tiling
    env = out["envelope"]
    assert env == [122.0, 20.0, 154.0, 46.0]

    # Hilbert order: recompute expected permutation from the bboxes
    bboxes = np.array([wkb.multipolygon_bbox(g) for g in polys["geom"]])
    expected_order = polys["ogc_fid"].to_numpy()[fgb.hilbert_order(bboxes)]
    got_order = np.array([f["properties"]["ogc_fid"] for f in out["features"]])
    assert np.array_equal(got_order, expected_order)


def test_fgb_roundtrip_points_and_nulls(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "name": ["a", None, "c"],
            "value": [1.5, float("nan"), 3.0],
            "n": pd.array([10, 20, 30], dtype="int64"),
            "geom": [
                wkb.encode_point(139.7, 35.7),
                wkb.encode_point(135.5, 34.7),
                wkb.encode_point(141.3, 43.1),
            ],
        }
    )
    sdf = spark.createDataFrame(pdf)
    path = str(tmp_path / "pts.fgb")
    export.write_flatgeobuf(sdf, path, layer_name="pts", srid=4326)
    out = export.read_flatgeobuf(path)
    assert out["geometry_type"] == fgb.GT_POINT
    by_n = {f["properties"]["n"]: f for f in out["features"]}
    assert by_n[10]["properties"]["name"] == "a"
    assert "name" not in by_n[20]["properties"]  # null column omitted
    assert "value" not in by_n[20]["properties"]  # NaN treated as null
    assert by_n[30]["properties"]["value"] == 3.0
    ring = by_n[10]["geometry"]["rings"][0]
    assert np.array_equal(ring, np.array([[139.7, 35.7]]))


def test_fgb_rejects_unsupported_column(spark, tmp_path):
    pdf = pd.DataFrame({"arr": [[1, 2]], "geom": [wkb.encode_point(0.0, 0.0)]})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="not supported"):
        export.write_flatgeobuf(sdf, str(tmp_path / "x.fgb"))
