"""Scalar string/normalization functions from the reference (SURVEY §2.6).

Column-expression builders (JVM-side, whole-stage codegen) for everything
expressible with built-ins; Arrow-vectorized pandas UDFs only for NFKC and
encoding detection (no Spark built-in exists).

A40 range normalization ports /root/reference/NOTES.md:10-99 (plpgsql
``a40_normalize_range`` / ``a40_get_lower_bound`` / ``a40_get_upper_bound``)
into Spark Column algebra: '0.5m以上1.0m未満' -> ('0.5m-1m', 0.5, 1.0),
'5m以上' -> ('5m-', 5, 99), '0.3m未満' -> ('-0.3m', -99, 0.3).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def nfkc_udf(s: pd.Series) -> pd.Series:
    """F1 — NFKC Unicode normalization
    (/root/reference/src/loader/admini_boundary.rs:52)."""
    return s.map(lambda v: unicodedata.normalize("NFKC", v) if v is not None else None)


ENCODING_TRY_ORDER = ("cp932", "utf-8")  # CP932 first — parity with gdal.rs:326-408


def detect_encoding(samples: list[bytes]) -> str:
    """F2 — decode try-chain over a row sample; first encoding that decodes
    every sample without errors wins (CP932 probed before UTF-8, mirroring
    /root/reference/src/loader/gdal.rs:337-356 fallback order)."""
    for enc in ENCODING_TRY_ORDER:
        try:
            for b in samples:
                bytes(b).decode(enc, errors="strict")
            return enc
        except (UnicodeDecodeError, ValueError):
            continue
    return "utf-8"


def decode_binary_udf(encoding: str):
    """Vectorized bytes->str decode with a fixed (detected) encoding."""

    @F.pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: bytes(b).decode(encoding) if b is not None else None)

    return _decode


def year_extract(col: Column) -> Column:
    """F3 — leading-digits year from '2006年（平成18年）' style strings
    (/root/reference/src/scraper/data_page.rs:277-301)."""
    return F.nullif(F.regexp_extract(col, r"^(\d+)", 1), F.lit("")).cast("int")


def strip_fullwidth_parens(col: Column) -> Column:
    """F4 — remove （…） and trim (/root/reference/src/loader/mapping.rs:39-47)."""
    return F.trim(F.regexp_replace(col, "（[^）]*）", ""))


def normalize_identifier(col: Column) -> Column:
    """F7 — lowercase + non-alnum -> '_' (/root/reference/src/main.rs:69-112,
    /root/reference/src/loader/load_queue.rs:42)."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]+", "_")


def nullif_trim(col: Column) -> Column:
    """F12 — trimmed-or-null cell (/root/reference/src/loader/xslx_helpers.rs:3-8)."""
    return F.nullif(F.trim(col), F.lit(""))


def url_last_segment(col: Column) -> Column:
    """F11 — filename = last URL path segment (/root/reference/src/downloader.rs:21-31)."""
    return F.regexp_extract(col, "([^/]+)$", 1)


def url_host(col: Column) -> Column:
    """Canonical host of a URL for host-level corpus grouping/dedup:
    authority extracted by regex (portable to the RE2 oracle — no
    java.net parsing; terminated by /, ? or # so path-less URLs with a
    query/fragment don't swallow it), userinfo@ stripped, lowercased,
    leading 'www.' and any :port stripped. Pure Column algebra; runs
    inside codegen at scan speed."""
    host = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.regexp_replace(F.lower(host), r":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def parse_code_list(entries: list[str]) -> dict[str, str]:
    """F8 — 'code:label' entries -> {code: label}; split-once on the first
    ':', trimmed, empty entries dropped, last-write-wins on duplicate codes
    (/root/reference/src/scraper/data_page.rs:211-258)."""
    out: dict[str, str] = {}
    for e in entries:
        e = e.strip()
        if not e or ":" not in e:
            continue
        code, label = e.split(":", 1)
        out[code.strip()] = label.strip()
    return out


def code_list_map_col(col: Column) -> Column:
    """F8 distributed: array<string> of 'code:label' -> map<string,string>.
    Split-once on the FIRST ':' (labels may contain colons); duplicate
    codes keep the last entry (map_from_entries of reversed array would
    keep first; Spark keeps last key on duplicates)."""
    cleaned = F.filter(
        F.transform(col, lambda e: F.trim(e)), lambda e: (e != "") & e.contains(":")
    )
    return F.map_from_entries(
        F.transform(
            cleaned,
            lambda e: F.struct(
                F.trim(e.substr(F.lit(1), F.instr(e, ":") - 1)).alias("key"),
                F.trim(e.substr(F.instr(e, ":") + 1, F.length(e))).alias("value"),
            ),
        )
    )


# ------------------------------------------------------------------ A40 F13

_NUM = r"([0-9]+(?:\.[0-9]+)?)"


def a40_normalize_range(col: Column) -> Column:
    """'0.5m以上1.0m未満' -> '0.5m-1m'; '5m以上' -> '5m-'; '0.3m未満' -> '-0.3m'.

    Numbers are re-rendered without trailing '.0' (1.0 -> 1), matching the
    reference's normalized labels (NOTES.md:19-36)."""
    lo = F.regexp_extract(col, _NUM + "m以上", 1)
    hi = F.regexp_extract(col, _NUM + "m未満", 1)

    def clean(c: Column) -> Column:
        return F.regexp_replace(c, r"\.0+$", "")

    return (
        F.when((lo != "") & (hi != ""), F.concat(clean(lo), F.lit("m-"), clean(hi), F.lit("m")))
        .when(lo != "", F.concat(clean(lo), F.lit("m-")))
        .when(hi != "", F.concat(F.lit("-"), clean(hi), F.lit("m")))
        .otherwise(col)
    )


def a40_lower_bound(col: Column) -> Column:
    """Numeric lower bound; open-below sentinel -99 (NOTES.md:38-67)."""
    lo = F.nullif(F.regexp_extract(col, _NUM + "m以上", 1), F.lit(""))
    return F.coalesce(lo.cast("double"), F.lit(-99.0))


def a40_upper_bound(col: Column) -> Column:
    """Numeric upper bound; open-above sentinel 99 (NOTES.md:69-99)."""
    hi = F.nullif(F.regexp_extract(col, _NUM + "m未満", 1), F.lit(""))
    return F.coalesce(hi.cast("double"), F.lit(99.0))
