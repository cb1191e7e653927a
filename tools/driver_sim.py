"""Simulate the driver's verify protocol end-to-end against __spark_entry__.py.

Vanilla SparkSession (no engine-side config), t1 smoke via entry(), t2
differential vs DuckDB at sf0.01 with an order-insensitive value hash —
the same shape of comparison the driver records in CORRECTNESS_r{N}.json.

Canonicalization mirrors the REAL driver: both sides go through pandas
(`DataFrame.toPandas()` for Spark, `rel.df(date_as_object=True)` for
DuckDB) before hashing.  Round 2 proved this matters: `rel.fetchall()`
returns a HUGEINT as a Python int (repr "11474") while `rel.df()`
converts it to float64 (repr "11474.0"), so a repr-hash over fetchall()
green-lit an oracle the driver then failed (q_llm_clean_corpus,
VERDICT_r02 #1).  date_as_object keeps DATE columns as datetime.date on
both sides (the driver's r1+r2 verdicts prove it equates them; a plain
.df() would false-flag every DATE-emitting query).

Both result schemas are linted, not just Spark's: DuckDB outputs typed
HUGEINT / DECIMAL / LIST / STRUCT / MAP are flagged because the pandas
conversion mangles them (float64 drift, unhashable cells).

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

# DuckDB result types whose pandas (.df()) conversion drifts from the
# logical value: HUGEINT -> float64, DECIMAL -> float64 w/ trailing-zero
# drift, nested types -> unhashable python objects.
_DUCK_UNSAFE = ("HUGEINT", "DECIMAL", "[]", "STRUCT", "MAP", "LIST")


def _pdf_hash(pdf) -> str:
    """Order-insensitive value hash of a pandas DataFrame (columns sorted
    by name, rows canonicalized via repr) — the driver-equivalent canon."""
    cols = sorted(pdf.columns)
    canon = sorted(
        tuple(repr(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.sha256(str(canon).encode()).hexdigest()[:12]


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

    # the real driver canonicalizes via pandas, which chokes on DECIMAL
    # (trailing-zero drift) and ARRAY/MAP (unhashable) output columns —
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
        spdf = df.toPandas()
        if k not in osql:
            rows_only += 1
            print(f"  rows-only {k}: {len(spdf)} rows", flush=True)
            continue
        rel = con.sql(osql[k])
        for name, typ in zip(rel.columns, rel.types):
            ts = str(typ).upper()
            if any(u in ts for u in _DUCK_UNSAFE):
                bad += 1
                print(f"UNSAFE-ORACLE-TYPE {k}: {name} is {ts}", flush=True)
        # date_as_object=True: DATE columns come back as datetime.date,
        # matching Spark's toPandas() — the driver demonstrably treats
        # Spark DATE vs DuckDB DATE as equal (q_fn_datetime/q_fn_cast/
        # q_fn_datetime2 green in r1+r2), while a plain .df() turns them
        # into midnight Timestamps and false-mismatches all three.
        dpdf = rel.df(date_as_object=True)
        match = (
            len(spdf) == len(dpdf)
            and sorted(spdf.columns) == sorted(dpdf.columns)
            and _pdf_hash(spdf) == _pdf_hash(dpdf)
        )
        ok += match
        bad += not match
        if not match:
            print(f"MISMATCH {k}: spark={len(spdf)} oracle={len(dpdf)}", flush=True)
    print(f"t2: {ok} hash-match, {bad} mismatch, {rows_only} rows-only", flush=True)
    _update_coverage_ledger(ok, bad, rows_only, sf)
    spark.stop()
    return 1 if bad else 0


_LEDGER_MARKER = "<!-- driver_sim:last-full-run -->"
_README_MARKER = "<!-- driver_sim:readme-inventory -->"


def _rewrite_marker_line(path: str, marker: str, line: str) -> None:
    try:
        with open(path) as f:
            lines = f.read().splitlines()
    except OSError:
        return
    for i, l in enumerate(lines):
        if marker in l:
            if lines[i] != line:
                lines[i] = line
                with open(path, "w") as f:
                    f.write("\n".join(lines) + "\n")
            return


def _update_coverage_ledger(ok: int, bad: int, rows_only: int, sf: str) -> None:
    """Rewrite the machine-owned totals lines in COVERAGE.md (VERDICT
    r13 wrong #1) and README.md (VERDICT r15 wrong #3: README's
    hand-maintained inventory drifted too — same lesson, same fix: the
    tool that produces the number writes the line). Only a
    FULL-surface run updates them; marker lines must already exist."""
    import os

    n = ok + bad + rows_only
    sf_name = os.path.basename(sf.rstrip("/"))
    _rewrite_marker_line(
        os.path.join(REPO, "COVERAGE.md"), _LEDGER_MARKER,
        f"Last full driver_sim run: **{ok} hash-match, {bad} mismatch, "
        f"{rows_only} rows-only** over {n} declared "
        f"keys at {sf_name} "
        f"(machine-written by tools/driver_sim.py). {_LEDGER_MARKER}")
    _rewrite_marker_line(
        os.path.join(REPO, "README.md"), _README_MARKER,
        f"Declared surface: **{n} keys — {ok} hash-match, {bad} "
        f"mismatch, {rows_only} rows-only** at {sf_name} "
        f"(machine-written by tools/driver_sim.py). {_README_MARKER}")


if __name__ == "__main__":
    sys.exit(main())
