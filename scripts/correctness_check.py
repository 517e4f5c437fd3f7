"""Driver-style correctness harness: run every queries() entry and its
DuckDB oracle side by side at the driver's correctness SF, compare row
count, schema (column names), and values incl. dtypes (the driver hashes
values after sorting columns by name — dtype differences fail the hash).

Usage: spark-submit --py-files /tmp/jpspark.zip scripts/correctness_check.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from jpspark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("correctness-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, q in qs.items():
        try:
            sp = q(spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} SPARK ERROR: {exc}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only       spark_rows={len(sp)}")
            continue
        od = con.sql(oracles[name]).df()
        cols = sorted(sp.columns)
        ok_schema = cols == sorted(od.columns)
        if not ok_schema:
            failures.append(name)
            print(f"{name:28s} SCHEMA MISMATCH spark={cols} oracle={sorted(od.columns)}")
            continue
        sp2 = sp[cols].sort_values(cols).reset_index(drop=True)
        od2 = od[cols].sort_values(cols).reset_index(drop=True)
        ok_rows = len(sp2) == len(od2)
        ok_dtypes = list(sp2.dtypes) == list(od2.dtypes)
        ok_vals = ok_rows and sp2.equals(od2)
        status = "OK" if (ok_rows and ok_dtypes and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name:28s} {status:4s} rows={len(sp2)}/{len(od2)} "
            f"dtypes_match={ok_dtypes} values_match={ok_vals}"
        )
        if status == "FAIL" and ok_rows and not ok_vals:
            neq = ~(sp2 == od2).all(axis=1)
            print("  spark:", sp2[neq].head(3).to_dict("records"))
            print("  oracle:", od2[neq].head(3).to_dict("records"))
        elif status == "FAIL" and not ok_dtypes:
            print("  spark dtypes:", dict(sp2.dtypes.astype(str)))
            print("  oracle dtypes:", dict(od2.dtypes.astype(str)))
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
