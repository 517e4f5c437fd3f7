"""Datasets metadata catalog — the engine's analog of the reference's
``datasets`` PostGIS table (/root/reference/src/metadata.rs:181-185) and
per-file ``{identifier}.metadata.json`` sidecars
(/root/reference/src/loader/load_queue.rs:146-186).

Catalog entries carry the same JSON shape documented in
/root/reference/README.md:22-90: name, desc, source, source_url, license,
primary_key, columns: {name -> {desc, foreign_key, enum_values}}.

FK inference mirrors metadata.rs:42-47: any column whose description/type
string contains 行政区域コード gets a foreign key to
``admini_boundary_cd.改正後のコード``. Geometry columns are recorded with
their promoted MULTI type + SRID (table-property analog of
geometry_columns reflection, metadata.rs:134-154).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

ADMINI_FK = {"table": "admini_boundary_cd", "column": "改正後のコード"}
FK_TRIGGER = "行政区域コード"

# exact column order of the crosswalk table, /root/reference/data/
# schema.sql:3-15 — also the xlsx row layout (the reference binds $1..$11
# positionally, admini_boundary.rs:86-101)
CROSSWALK_COLUMNS = [
    "行政区域コード", "都道府県名（漢字）", "市区町村名（漢字）",
    "都道府県名（カナ）", "市区町村名（カナ）", "コードの改定区分",
    "改正年月日", "改正後のコード", "改正後の名称", "改正後の名称（カナ）",
    "改正事由等",
]

_SPARK_TO_PG = {
    "string": "varchar",
    "int": "int4",
    "bigint": "int8",
    "double": "float8",
    "float": "float4",
    "date": "date",
    "timestamp": "timestamp",
    "binary": "bytea",
    "boolean": "bool",
}


@dataclass
class ColumnMeta:
    name: str
    type: str
    desc: str | None = None
    foreign_key: dict | None = None
    enum_values: dict | list | None = None


@dataclass
class DatasetMeta:
    identifier: str
    name: str
    desc: str | None = None
    source: str | None = None
    source_url: str | None = None
    license: str | None = None
    primary_key: str = "ogc_fid"
    geometry_type: str | None = None
    srid: int = 6668  # JGD2011 geographic (README.md:85)
    columns: list[ColumnMeta] = field(default_factory=list)

    def to_json(self) -> dict:
        return {
            "identifier": self.identifier,
            "name": self.name,
            "desc": self.desc,
            "source": self.source,
            "source_url": self.source_url,
            "license": self.license,
            "primary_key": self.primary_key,
            "geometry_type": self.geometry_type,
            "srid": self.srid,
            "columns": [
                {
                    "name": c.name,
                    "type": c.type,
                    "desc": c.desc,
                    "foreign_key": c.foreign_key,
                    "enum_values": c.enum_values,
                }
                for c in self.columns
            ],
        }


def spark_type_to_pg(t: str) -> str:
    """SURVEY F10 type map (gdal.rs:214-234), Spark-side names; arrays map
    to element[] like OGR lists, anything else falls back to varchar."""
    if t.startswith("array<") and t.endswith(">"):
        return _SPARK_TO_PG.get(t[6:-1], "varchar") + "[]"
    return _SPARK_TO_PG.get(t, "varchar")


def build_metadata_from_df(
    df: DataFrame,
    identifier: str,
    name: str,
    attribute_meta: dict[str, dict] | None = None,
    geom_col: str = "geom",
    geometry_type: str | None = "MULTIPOLYGON",
    **kwargs,
) -> DatasetMeta:
    """Reflect a DataFrame's schema into catalog metadata, merging the
    per-attribute API metadata (desc/enum) by column name — the J2
    metadata-attribute lookup join (metadata.rs:39-69), driver-side."""
    attribute_meta = attribute_meta or {}
    cols = [ColumnMeta("ogc_fid", "int4", desc="serial primary key")]
    for f_ in df.schema.fields:
        if f_.name == geom_col:
            continue
        am = attribute_meta.get(f_.name, {})
        fk = ADMINI_FK if FK_TRIGGER in f_.name or FK_TRIGGER in str(am.get("desc", "")) else None
        cols.append(
            ColumnMeta(
                name=f_.name,
                type=spark_type_to_pg(f_.dataType.simpleString()),
                desc=am.get("desc"),
                foreign_key=fk,
                enum_values=am.get("enum_values"),
            )
        )
    if geom_col in df.columns and geometry_type:
        cols.append(ColumnMeta(geom_col, f"geometry({geometry_type},{kwargs.get('srid', 6668)})"))
    return DatasetMeta(identifier=identifier, name=name, columns=cols, geometry_type=geometry_type, **kwargs)


class Catalog:
    """File-backed catalog: one JSON per dataset + an index — read-modify-
    write upsert (S11). Works the same on local disk or any fuse-mounted
    object store; on a real cluster this would be an Iceberg table."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, identifier: str) -> str:
        return os.path.join(self.root, f"{identifier}.metadata.json")

    def upsert(self, meta: DatasetMeta) -> None:
        tmp = self._path(meta.identifier) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta.to_json(), f, ensure_ascii=False, indent=1)
        os.replace(tmp, self._path(meta.identifier))

    def get(self, identifier: str) -> dict | None:
        p = self._path(identifier)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def list_datasets(self) -> list[str]:
        return sorted(
            f[: -len(".metadata.json")]
            for f in os.listdir(self.root)
            if f.endswith(".metadata.json")
        )

    def table_exists(self, identifier: str) -> bool:
        """S13 layer-existence probe (gdal.rs:253-265)."""
        return os.path.exists(self._path(identifier))
