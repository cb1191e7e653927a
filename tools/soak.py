"""10x scale soak — synthesize a seeded, throwaway 10x replica of the
sf0.1 fixture and run the scale-sensitive query families against it
(VERDICT_r04 next-step #6). Usage:

    python tools/soak.py gen            # build /tmp/spark_graft_soak/sf1
    python tools/soak.py run            # bench the soak key set, write SOAK.json
    python tools/soak.py report         # compare vs sf0.1 per-row scaling

Replication model (deterministic, no RNG):
- events: 10 replicas, event_id/user_id shifted per replica — 10x rows,
  10x keys, same time range (10x event density, as a larger fleet
  would produce).
- documents: doc_id shifted; each replica's text is the same word
  multiset SHUFFLED by a (doc, replica)-keyed hash order — word/char
  statistics (token counts, language profile, lengths) are preserved
  but 3-word shingles are destroyed, so replicas are NOT
  near-duplicates of each other and the dedup keys scale by corpus
  size, not quadratically by manufactured clusters. (A plain ROTATION
  is wrong here: it preserves every contiguous shingle except the two
  boundary ones, so each replica is a jaccard~1 near-dup of its
  original — the first soak run hit exactly that, turning the corpus
  into 45x pair volume. It did double as a useful dup-heavy stress:
  fuzzy dedup still completed, 250k verified pairs in 109 s with the
  df/bucket caps holding.) Within-replica near-dups (the fixture's
  real ones) replicate 10x. CAVEAT (round 7): fingerprints that are
  WORD-MULTISET functions — SimHash over unigram bags — are invariant
  under the shuffle, so every replica of a doc is a Hamming-0 dup of
  its original and q_llm_dedup_simhash's soak output is ~119x pair
  volume (10.7M pairs) by construction; its ~2.2x per-scaled wall
  clock is output-size-driven, not an engine quadratic (the banded
  join finds exactly the manufactured dups).
- embeddings: vec_id shifted, vector rotated by replica index (norms
  and pairwise-within-replica geometry preserved).
- TPC-H: customer/orders/lineitem/part/supplier shifted consistently
  (o_custkey moves with c_custkey, l_orderkey with o_orderkey, ...) so
  referential integrity and join selectivities hold; region/nation are
  fixed dims and are copied as-is.

The soak gate: each key's wall clock vs its sf0.1 time, divided by the
work-scaling factor (10x for linear keys), should stay under ~2x —
above that indicates a plan that degrades super-linearly (lost
broadcast, uncapped skew bucket, driver bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
BASE = os.environ.get(
    "SPARK_GRAFT_SOAK_DIR",
    f"/tmp/spark_graft_soak/x{REPLICAS}" if REPLICAS != 10
    else "/tmp/spark_graft_soak/sf1",
)
SRC = "/root/testdata/sf0.1"
#: artifact path: SOAK.json for the standard 10x run, SOAK_x<N>.json otherwise
OUT = os.path.join(
    REPO, "SOAK.json" if REPLICAS == 10 else f"SOAK_x{REPLICAS}.json"
)

# The scale-sensitive families: every dedup/CC/ANN/pack key + the full
# TPC-H sweep + the heavy window/stream lowerings.
# Round 9 (VERDICT r8 #5, the >=120-key target): the soak set is now
# EVERY declared registry key except a short, documented exclude list —
# coverage by subtraction can't silently miss new keys.
SOAK_EXCLUDE = {
    "q_warmup",          # harness warm-up, not an operator
    # declared brute-force probe keys whose cost is O(N^2) BY CONTRACT
    # (SCALE.md documents the limit; the scale path is their bucketed /
    # binned siblings, which ARE soaked):
    "q_join_cross_topk",
}


def _soak_keys() -> list[str]:
    import flink_realtime_edu_demo_spark.queries  # noqa: F401
    from flink_realtime_edu_demo_spark.registry import QUERIES

    return [k for k in sorted(QUERIES) if k not in SOAK_EXCLUDE]


#: q_llm_knn_ivf_scaled is a declared registry key since r6 (the
#: auto-scaled deployment ANN became the oracle-backed surface); no
#: soak-only shims remain.
EXTRA_CALLABLES: dict = {}


def gen() -> None:
    os.makedirs(BASE, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def maxp1(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]

    E, U = maxp1("events", "event_id"), maxp1("events", "user_id")
    D = maxp1("documents", "doc_id")
    V = maxp1("embeddings", "vec_id")
    C = maxp1("customer", "c_custkey")
    O = maxp1("orders", "o_orderkey")
    P = maxp1("part", "p_partkey")
    S = maxp1("supplier", "s_suppkey")

    def write(table: str, select_sql: str) -> None:
        out = f"{BASE}/{table}.parquet"
        con.execute(f"""
            COPY (
                SELECT q.* FROM unnest(generate_series(0, {REPLICAS - 1})) AS r(k),
                LATERAL ({select_sql}) q
            ) TO '{out}' (FORMAT PARQUET)
        """)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"  {table}: {n} rows")

    t0 = time.perf_counter()
    write("events", f"""
        SELECT event_id + r.k * {E} AS event_id, ts,
               user_id + r.k * {U} AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet')""")
    # shuffle the word list by a (doc, replica)-keyed hash order: same
    # word multiset (token/char stats preserved), shingle set destroyed
    write("documents", f"""
        SELECT doc_id + kk * {D} AS doc_id,
               CASE WHEN kk = 0 THEN text ELSE array_to_string(
                   list_transform(
                       list_sort(list_transform(
                           generate_series(1, len(w)),
                           i -> struct_pack(
                               h := hash(doc_id * 1000003 + i * 31 + kk),
                               i := i))),
                       s -> w[s.i]
                   ), ' ') END AS text,
               lang, source, n_chars
        FROM (SELECT *, r.k AS kk, string_split(text, ' ') AS w
              FROM read_parquet('{SRC}/documents.parquet'))""")
    write("embeddings", f"""
        SELECT vec_id + r.k * {V} AS vec_id,
               CASE WHEN r.k = 0 THEN embedding ELSE
                   list_concat(embedding[1 + (r.k % len(embedding)):],
                               embedding[:(r.k % len(embedding))])
               END AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet')""")
    write("customer", f"""
        SELECT c_custkey + r.k * {C} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet')""")
    write("orders", f"""
        SELECT o_orderkey + r.k * {O} AS o_orderkey,
               o_custkey + r.k * {C} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet')""")
    write("lineitem", f"""
        SELECT l_orderkey + r.k * {O} AS l_orderkey,
               l_partkey + r.k * {P} AS l_partkey,
               l_suppkey + r.k * {S} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet')""")
    write("part", f"""
        SELECT p_partkey + r.k * {P} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet')""")
    write("supplier", f"""
        SELECT s_suppkey + r.k * {S} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet')""")
    for t in ("region", "nation"):
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
            TO '{BASE}/{t}.parquet' (FORMAT PARQUET)""")
        print(f"  {t}: copied")
    print(f"gen done in {time.perf_counter() - t0:.1f}s -> {BASE}")


def run() -> None:
    import flink_realtime_edu_demo_spark.queries  # noqa: F401
    from flink_realtime_edu_demo_spark.registry import QUERIES
    from flink_realtime_edu_demo_spark.session import get_spark

    spark = get_spark(app_name="soak", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_agg_basic"](spark, BASE).collect()  # warm-up
    subset = os.environ.get("SPARK_GRAFT_SOAK_KEYS")
    keys = subset.split(",") if subset else _soak_keys()
    # sink=noop (a noop-format write) avoids materializing huge result
    # sets on the driver — required for >=100x runs, where a 10M-row
    # collect() OOMs the JVM (a harness artifact: the engine-side plan
    # had already completed). A count() sink is NOT a valid alternative:
    # Catalyst prunes the final projections under it, so narrow
    # transform keys appear ~free (measured: fingerprint 0.17 s vs its
    # real 4 s). rows is recorded as -1 under noop.
    sink = os.environ.get("SPARK_GRAFT_SOAK_SINK", "collect")
    runnable = {**QUERIES, **EXTRA_CALLABLES}
    out: dict[str, dict] = {}
    for key in keys:
        if key not in runnable:
            print(f"  {key}: UNKNOWN", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            df = runnable[key](spark, BASE)
            if sink == "noop":
                df.write.mode("overwrite").format("noop").save()
                n = -1
            else:
                n = len(df.collect())
        except Exception as e:
            out[key] = {"err": str(e).split(chr(10))[0][:200]}
            print(f"  {key}: ERROR {out[key]['err']}", flush=True)
            continue
        dt = round(time.perf_counter() - t0, 3)
        out[key] = {"sec": dt, "rows": n}
        print(f"  {key}: {dt:.2f}s  {n} rows", flush=True)
        spark.catalog.clearCache()
    keys_out = out
    if subset and os.path.exists(OUT):
        # a subset run (SPARK_GRAFT_SOAK_KEYS) refreshes just those keys
        # in the existing artifact instead of discarding the full sweep
        with open(OUT) as f:
            prev = json.load(f)
        if prev.get("replicas") == REPLICAS:
            keys_out = {**prev.get("keys", {}), **out}
    with open(OUT, "w") as f:
        json.dump({"sf_dir": BASE, "replicas": REPLICAS, "keys": keys_out},
                  f, indent=1)
    print(f"wrote {OUT}")
    spark.stop()


def report() -> None:
    with open(OUT) as f:
        soak = json.load(f)["keys"]
    with open(os.path.join(REPO, "BENCH_local.json")) as f:
        base = json.load(f)["queries"]
    rows = []
    for k, v in soak.items():
        if "err" in v:
            rows.append((k, None, None, "ERR " + v["err"]))
            continue
        b = base.get(k)
        if not b:
            rows.append((k, v["sec"], None, "no sf0.1 baseline"))
            continue
        ratio = v["sec"] / (b * REPLICAS)
        rows.append((k, v["sec"], round(ratio, 2), ""))
    rows.sort(key=lambda r: -(r[2] or 0))
    print(f"{'key':32} {'soak_s':>8} {'vs 10x-scaled':>14}")
    for k, s, r, note in rows:
        print(f"{k:32} {s if s is not None else '-':>8} "
              f"{r if r is not None else '-':>14} {note}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    {"gen": gen, "run": run, "report": report}[cmd]()
