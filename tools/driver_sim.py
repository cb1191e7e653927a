"""Simulate the driver's verify protocol end-to-end against __spark_entry__.py.

Vanilla SparkSession (no engine-side config), t1 smoke via entry(), t2
differential vs DuckDB at sf0.01 with an order-insensitive value hash —
the same shape of comparison the driver records in CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import importlib.util
import sys

import duckdb

REPO = "/root/repo"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spec = importlib.util.spec_from_file_location("__spark_entry__", f"{REPO}/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    print("t1 entry rows:", len(m.entry(spark).collect()), flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    def vhash(cols: list[str], rows: list[tuple]) -> str:
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        canon = sorted(tuple(repr(r[i]) for i in order) for r in rows)
        return hashlib.sha256(str(canon).encode()).hexdigest()[:12]

    # the real driver canonicalizes via pandas, which chokes on DECIMAL
    # (trailing-zero drift) and ARRAY/MAP (unhashable) output columns —
    # our repr-hash passed round 1 where the driver's canon failed, so
    # lint every query's output schema, rows-only ones included.
    unsafe = ("DecimalType", "ArrayType", "MapType")

    qs, osql = m.queries(), m.oracle_sql()
    ok = bad = rows_only = 0
    for k in sorted(qs):
        df = qs[k](spark, sf)
        for f in df.schema.fields:
            if type(f.dataType).__name__ in unsafe:
                bad += 1
                print(f"UNSAFE-SCHEMA {k}: {f.name} is {f.dataType.simpleString()}", flush=True)
        srows = [tuple(r) for r in df.collect()]
        if k not in osql:
            rows_only += 1
            print(f"  rows-only {k}: {len(srows)} rows", flush=True)
            continue
        rel = con.sql(osql[k])
        drows = rel.fetchall()
        match = (
            len(srows) == len(drows)
            and sorted(df.columns) == sorted(rel.columns)
            and vhash(df.columns, srows) == vhash(list(rel.columns), drows)
        )
        ok += match
        bad += not match
        if not match:
            print(f"MISMATCH {k}: spark={len(srows)} oracle={len(drows)}", flush=True)
    print(f"t2: {ok} hash-match, {bad} mismatch, {rows_only} rows-only", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
