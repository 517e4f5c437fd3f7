"""Field-mapping / matcher layer — the reference's "logical plan"
(ShapefileMetadata, /root/reference/src/loader/mapping.rs:10-37).

- ``template_to_regex`` ports the shapefile-name-template compiler
  (mapping.rs:49-106): placeholder tokens YY/MM/PP/CCCCC/AA/mmmm etc.
  become \\d{n}, the .shp suffix is stripped, and the result is anchored
  ``(?:^|/) ... (\\.shp|\\.cpg|\\.dbf|\\.prj|\\.qmd|\\.shx)$``.
- ``normalize_matcher_string`` ports the KSJ hint-bug fixes
  (mapping.rs:109-120): CRLF handling, A38a-/A38b-/A38c- -> A38-,
  A38-YY_PP_ -> A38-YY_.
- ``apply_field_mapping`` is P6: select+rename only the mapped attributes
  present in the source (absent ones silently skipped, gdal.rs:60-64).
- ``fallback_matchers`` is S4: if strict per-dataset regexes match nothing,
  widen to the catch-all shapefile-extension matcher (zip_traversal.rs:84-96),
  with the A33 special case (zip_traversal.rs:63-74).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHAPEFILE_EXTS = r"(\.shp|\.cpg|\.dbf|\.prj|\.qmd|\.shx)$"
CATCH_ALL = r"(?:^|/)[^/]*" + SHAPEFILE_EXTS

# placeholder tokens -> digit counts (mapping.rs:56-79)
_TOKENS = [
    ("CCCCC", 5),
    ("mmmm", 4),
    ("YYYY", 4),
    ("YY", 2),
    ("MM", 2),
    ("PP", 2),
    ("AA", 2),
    ("XX", 2),
]


@dataclass
class ShapefileMapping:
    """One output table: identifier (-> table name), name matchers,
    field mappings (readable name <- attribute code)."""

    identifier: str
    shapefile_name_templates: list[str]
    field_mappings: list[tuple[str, str]] = field(default_factory=list)  # (readable, code)

    def matchers(self) -> list[re.Pattern]:
        return [re.compile(template_to_regex(t)) for t in self.shapefile_name_templates]


def normalize_matcher_string(s: str) -> list[str]:
    """F6 (mapping.rs:109-120): split CRLF/LF lines, trim, drop empties,
    fix the documented KSJ hint bugs."""
    out = []
    for line in s.replace("\r\n", "\n").split("\n"):
        line = line.strip()
        if not line:
            continue
        line = re.sub(r"A38[abc]-", "A38-", line)
        # templates carry YY/PP tokens OR concrete digits — fix both forms
        line = re.sub(r"(A38-(?:\d\d|YY))_(?:\d\d|PP)_", r"\1_", line)
        out.append(line)
    return out


def template_to_regex(template: str) -> str:
    """F5 (mapping.rs:49-106): template -> anchored regex string.

    Longest tokens substitute first; literal text is escaped; a trailing
    .shp in the template is dropped (all sidecar extensions accepted)."""
    t = template.strip()
    t = re.sub(r"\.shp$", "", t, flags=re.IGNORECASE)
    pieces: list[str] = []
    i = 0
    while i < len(t):
        for tok, n in _TOKENS:
            if t.startswith(tok, i):
                pieces.append(rf"\d{{{n}}}")
                i += len(tok)
                break
        else:
            pieces.append(re.escape(t[i]))
            i += 1
    return r"(?:^|/)" + "".join(pieces) + SHAPEFILE_EXTS


def a33_special_case(identifier: str, templates: list[str]) -> list[str]:
    """zip_traversal.rs:63-74: A33's published hint says 'Polygon' but some
    years ship 'Plygon' — widen to match both spellings."""
    if identifier.upper() != "A33":
        return templates
    return [re.sub(r"Polygon", "Po?lygon", t) for t in templates]


def match_entries(entries: list[str], mapping: ShapefileMapping) -> list[str]:
    """S3/S4: filter archive entry names by the mapping's matchers, with
    known-bad prefix skip (P7, zip_traversal.rs:38-41) and catch-all
    fallback widening when strict matchers find nothing."""
    entries = [e.replace("\\", "/") for e in entries]  # zip_traversal.rs:25
    entries = [e for e in entries if not e.startswith("N08-21_GML/utf8/")]
    strict = [
        e for e in entries if any(m.search(e) for m in mapping.matchers())
    ]
    if strict:
        return strict
    loose = re.compile(CATCH_ALL)
    return [e for e in entries if loose.search(e)]


def match_entries_df(df: DataFrame, mapping: ShapefileMapping, entry_col: str = "entry") -> DataFrame:
    """Distributed variant of match_entries over an entry-name DataFrame:
    two-pass count-based fallback (SURVEY S4 Spark mapping)."""
    # JVM regex needs TWO chars (backslash-escaped backslash) to match ONE
    # literal backslash; r"\\" sends exactly those two. (r"\\\\" would send
    # four and match only doubled backslashes — entry paths with single
    # Windows separators would silently skip normalization.)
    cleaned = df.withColumn(entry_col, F.regexp_replace(F.col(entry_col), r"\\", "/")).filter(
        ~F.col(entry_col).startswith("N08-21_GML/utf8/")
    )
    pattern = "|".join(f"(?:{template_to_regex(t)})" for t in mapping.shapefile_name_templates)
    strict = cleaned.filter(F.col(entry_col).rlike(pattern))
    if strict.isEmpty():
        return cleaned.filter(F.col(entry_col).rlike(CATCH_ALL))
    return strict


def apply_field_mapping(df: DataFrame, mapping: ShapefileMapping) -> DataFrame:
    """P6 (gdal.rs:59-69): project to mapped attributes, renamed to their
    readable names; codes absent from the source are silently skipped."""
    present = [
        F.col(code).alias(readable)
        for readable, code in mapping.field_mappings
        if code in df.columns
    ]
    return df.select(*present)


def multi_output_mappings(base: ShapefileMapping, splits: dict[str, list[tuple[str, str]]]) -> list[ShapefileMapping]:
    """Multi-output split (mapping.rs:133-177): one source dataset feeding
    several output tables — e.g. N03 splits into a city table and a
    prefecture table with different field subsets. Each split shares the
    base's shapefile matchers; identifiers are '{base}_{split}'."""
    return [
        ShapefileMapping(
            identifier=variant_identifier(base.identifier, name),
            shapefile_name_templates=list(base.shapefile_name_templates),
            field_mappings=fields,
        )
        for name, fields in splits.items()
    ]


def select_version(versions: list[dict], year: int | None) -> dict | None:
    """P5/W2 (data_page.rs:127-144): pick the version whose
    [start_year, end_year] contains ``year``; else the one flagged
    most_recent; else the first. Versions are dicts with start_year,
    end_year, most_recent keys."""
    if not versions:
        return None
    if year is not None:
        for v in versions:
            if v.get("start_year") is not None and v.get("end_year") is not None:
                if v["start_year"] <= year <= v["end_year"]:
                    return v
    for v in versions:
        if v.get("most_recent"):
            return v
    return versions[0]


def variant_identifier(base: str, variant: str | None) -> str:
    """F7 (mapping.rs:241-248 + load_queue.rs:42): lowercase; variant id
    appended as {orig}_{variant}."""
    ident = base.lower()
    return f"{ident}_{variant.lower()}" if variant else ident
