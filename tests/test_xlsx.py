"""XLSX codec (S7/P9): spec'd part layout, shared strings, column gaps,
and the reference's crosswalk scan semantics — header sentinel, NFKC,
empty->NULL, all-NULL-row drop — with the reference's own golden row
(/root/reference/src/loader/admini_boundary.rs:232-237)."""

from __future__ import annotations

import io
import zipfile

import pandas as pd

from jpspark.codec import xlsx


def test_write_xlsx_spec_parts_and_roundtrip():
    rows = [["a", "b", None, 1101], ["a", None, "c", 2.5]]
    buf = xlsx.write_xlsx(rows, sheet_name="データ")
    with zipfile.ZipFile(io.BytesIO(buf)) as zf:
        names = set(zf.namelist())
    assert {
        "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/sharedStrings.xml",
        "xl/worksheets/sheet1.xml",
    } <= names
    got = xlsx.parse_xlsx(buf, "データ")
    assert got == [["a", "b", None, "1101"], ["a", None, "c", "2.5"]]
    # sheet lookup by name must be enforced
    import pytest

    with pytest.raises(KeyError):
        xlsx.parse_xlsx(buf, "nonexistent")


def test_column_gap_preserved_via_cell_refs():
    # hand-build a sheet where row 1 has only C1 set: A/B must be None
    rows = [[None, None, "only_c"]]
    got = xlsx.parse_xlsx(xlsx.write_xlsx(rows))
    assert got == [[None, None, "only_c"]]


def test_crosswalk_sentinel_nfkc_and_golden():
    from jpspark.catalog import CROSSWALK_COLUMNS

    rows = [
        ["行政区域コードの改正履歴", None],  # title junk before the header
        [None, "explanatory text"],
        list(CROSSWALK_COLUMNS),  # header row: first cell IS the sentinel
        # the reference's golden first data row (admini_boundary.rs:232-237)
        ["01000", "北海道", None, "ホッカイドウ", None],
        [None, None, None, None, None],  # all-empty row must be dropped
        # full-width digits/date exercise NFKC (F1)
        ["０１１０１", "北海道", "札幌市中央区", "ホッカイドウ", "サッポロシチュウオウク",
         "新設", "２０１４．４．５"],
    ]
    buf = xlsx.write_xlsx(rows, sheet_name="行政区域コード")
    out = xlsx.crosswalk_rows(buf)
    assert len(out) == 2
    assert len(out[0]) == 11  # padded to header width
    assert out[0][0] == "01000"
    assert out[0][1] == "北海道"
    assert out[0][2] is None
    assert out[0][3] == "ホッカイドウ"
    assert out[1][0] == "01101"  # NFKC: full-width digits -> ASCII
    assert out[1][6] == "2014.4.5"  # NFKC: full-width date punctuation


def test_crosswalk_from_xlsx_end_to_end(spark):
    """Actual .xlsx bytes -> DataFrame: sentinel + NFKC + blank-row drop +
    ON CONFLICT DO NOTHING (first code wins)."""
    from jpspark import fixtures as fx
    from jpspark.ops import ingest

    polys = fx.admin_polygons(10)
    buf = fx.admini_boundary_xlsx(polys)
    df = ingest.crosswalk_from_xlsx(spark, buf)
    pdf = df.toPandas()
    assert len(pdf) == 11  # 1 golden + 10 munis; dup + blank rows gone
    first = pdf.iloc[0]
    assert first["行政区域コード"] == "01000"
    assert first["都道府県名（漢字）"] == "北海道"  # the duplicate lost
    assert pd.isna(first["市区町村名（漢字）"])
    assert first["都道府県名（カナ）"] == "ホッカイドウ"
    # NFKC applied by the scan: full-width date + code normalized
    body = pdf.iloc[1:]
    assert (body["改正年月日"] == "2014.4.5").all()
    assert body["改正後のコード"].str.fullmatch(r"\d{5}").all()
    assert pdf["行政区域コード"].is_unique
