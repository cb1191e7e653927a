"""Schema audit: compare every oracle query's Spark output types against
the DuckDB oracle's column types, so a type-aware driver comparison can
never be surprised. Prints per-column mismatches.

Usage: python tools/schema_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# canonicalization: Spark simpleString -> canon, DuckDB type -> canon
_SPARK = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp_ntz": "ts", "timestamp": "ts", "date": "date",
    "binary": "bytes",
}
_DUCK = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
    "BOOLEAN": "bool", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "DATE": "date",
    "BLOB": "bytes", "UBIGINT": "u64",
}


def canon_spark(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return t.replace(" ", "")
    if t.startswith("array<"):
        return f"list<{canon_spark(t[6:-1])}>"
    return _SPARK.get(t, t)


def canon_duck(t: str) -> str:
    t = t.strip()
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.endswith("[]"):
        return f"list<{canon_duck(t[:-2])}>"
    return _DUCK.get(t, t)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import flink_realtime_edu_demo_spark.queries  # noqa: F401
    from flink_realtime_edu_demo_spark.registry import ORACLE, QUERIES
    from flink_realtime_edu_demo_spark.session import get_spark
    from flink_realtime_edu_demo_spark.testing.compare import duckdb_connect

    spark = get_spark(app_name="schema-audit", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(sf_dir)

    issues = 0
    for key in sorted(ORACLE):
        df = QUERIES[key](spark, sf_dir)
        s_types = {n: canon_spark(t) for n, t in df.dtypes}
        rel = con.sql(ORACLE[key])
        d_types = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
        for col in sorted(set(s_types) | set(d_types)):
            st, dt2 = s_types.get(col), d_types.get(col)
            if st != dt2:
                print(f"{key}.{col}: spark={st} oracle={dt2}")
                issues += 1
    print(f"{issues} type mismatches across {len(ORACLE)} oracle queries")
    spark.stop()
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
