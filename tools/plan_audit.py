"""Physical-plan audit: .explain('formatted') every registered query and
flag scale hazards (SURVEY.md §4 / BASELINE.md perf budget):

- CartesianProduct / BroadcastNestedLoopJoin outside the declared
  cross/theta queries
- fact-side joins that didn't broadcast a known dim
- row-at-a-time Python (BatchEvalPython) anywhere
- scans with no pushed filters on filtered queries
- exchange (shuffle) counts per query

Writes PLANS.md with the summary table + flags.
Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALLOWED_NESTED_LOOP = {
    "q_join_cross_topk", "q_llm_knn",
    # 1-row-aggregate broadcast crossJoins (scalar-subquery lowering /
    # corpus-size stat): the nested-loop side is exactly one row.
    "q_subquery_scalar", "q_llm_tfidf", "q_llm_keyword_topk",
    "q_tpch_q11", "q_tpch_q15", "q_tpch_q22",
    # BPE merges: each iteration's top pair is a persisted 1-row
    # broadcast crossJoin back into the vocab rows (queries/llm3.py);
    # encode replays the same training chain before its (vocab-scale)
    # broadcast join back into the corpus word stream
    "q_llm_bpe_merges", "q_llm_bpe_encode",
    # embedding decontamination (r15): the broadcast side is the
    # SYNTHESIZED benchmark set — bounded by the benchmark's size by
    # construction (20 rows here; benchmarks are small by definition),
    # so the crossJoin is a map-side scan of the corpus against a
    # broadcast table, the plan you'd want at 100 TB
    "q_llm_decontam_embed",
}

# Iterative keys: a per-iteration aggregation over REDUCED data
# (vocabulary / centroid scale, not corpus scale) legitimately
# shuffles once per unrolled iteration — the >4 heuristic would flag
# a shape that is already the one you'd want at 100 TB. Bounded at 16
# so a genuinely runaway plan still flags.
ALLOWED_ITERATIVE = {
    "q_llm_bpe_merges", "q_llm_bpe_encode",
}

# Multi-grain keys: pipelines whose aggregation grain SHRINKS
# monotonically (corpus -> doc x bucket -> bucket table -> doc) — the
# first exchange moves the corpus, every later one moves bounded
# reduced data (<= docs x 64 rows for DSIR), so 5-6 exchanges is the
# honest 100 TB shape, not a missed partitioning reuse. Cap 6 keeps a
# genuinely runaway plan flagging.
ALLOWED_MULTI_GRAIN = {
    "q_llm_dsir",
    # r11: corpus -> bigram df -> doc score -> ~1k-bin histogram ->
    # broadcast map back; the persisted doc-grain diamond leaves 5
    # exchanges, every one over strictly smaller data
    "q_llm_lm_buckets_scaled",
    # r11: events -> N/8192 chunk summary -> N/8192^2 super-chunk
    # summary (the two-level prefix scan) -> broadcast joins back ->
    # 2-row lateness agg; 6 exchanges, monotone shrinking grain
    "q_stream_late_branch",
    # r16: the 4-variable combinations chain — one exchange per
    # user-declared pattern element (per-k loop join legs + the two
    # skip-till-next pointer hops), every one moving only the
    # filtered admitted stream or the match-sized candidate set,
    # never the corpus twice; all legs hash-partition on the same
    # key, so the accumulated left side never re-shuffles
    "q_cep_combinations_chain",
}

# Keys whose plan may carry an Exchange SinglePartition (global sort /
# unpartitioned window / single-partition agg) because the input
# feeding it is provably REDUCED first — a bounded-cardinality
# aggregate of the corpus, never the corpus itself (VERDICT r10 #6:
# "no unpartitioned window over non-reduced input" is now a mechanical
# rule). Each entry documents the reduced grain.
ALLOWED_SINGLE_PARTITION = {
    # r12 (ADVICE r11): the hazard check is now ANCESTRY — a Window/
    # Sort node consuming the SinglePartition exchange's output — not
    # co-occurrence, so the 14 entries whose Sorts were partition-local
    # (sort-merge joins, sort-based aggregation, TakeOrdered limit
    # forms) left the allowlist: q_sort_limit, q_sort_nulls,
    # q_agg_rollup/cube/grouping_sets, q_llm_heavy_hitters,
    # q_llm_bpe_merges/encode, q_dq_profile, q_subquery_scalar,
    # q_llm_tfidf, q_tpch_q11/q15/q22. q_llm_lm_buckets (exact NTILE,
    # the one "documented hazard form") was demoted from the registry
    # the same round. What remains is every declared key whose plan
    # REALLY windows/sorts a single partition — each one over provably
    # reduced input, never the corpus:
    "q_llm_mix_weights",      # n_sources rows after reduction
    "q_stream_late_branch",   # N/8192² super-chunk summary (r11 2-level)
    "q_llm_lm_buckets_scaled",  # tercile window over the <=1k-bin
                                # histogram — the reduced form itself
    "q_llm_dsir",             # 64-bucket corpus stat fold
    "q_llm_keyword_topk",     # rank window over the k-row keyword table
    "q_join_theta_scaled",    # suffix-sum window over per-distinct-
                              # balance counts — bounded currency
                              # domain (<=~1.1M values at ANY corpus
                              # size), never the supplier rows (r14)
}


_TREE_LINE = re.compile(
    r"^(?P<prefix>[\s:+\-*]*)(?P<name>[A-Za-z][A-Za-z0-9]*)[^(\n]*"
    r"\((?P<id>\d+)\)\s*$"
)


def _tree_sections(plan: str):
    """Yield every tree-rendered section of a formatted explain string
    as [(indent, node_name, node_id)] — the MAIN plan tree and each
    subquery tree under '===== Subqueries =====' (ADVICE r12: the old
    first-section-only parse never checked subquery-hosted
    windows/sorts). Blank-line-delimited chunks with no tree lines
    (detail blocks — their '(n) Name' headers start with '(' and never
    match _TREE_LINE) yield nothing."""
    for chunk in plan.split("\n\n"):
        tl = []
        for line in chunk.splitlines():
            m = _TREE_LINE.match(line)
            if m:
                tl.append(
                    (len(m.group("prefix")), m.group("name"),
                     m.group("id")))
        if tl:
            yield tl


def _single_partition_ids(plan: str) -> set:
    """Node ids of Exchange detail blocks whose Arguments line is
    SinglePartition. The intermediate-line pattern accepts ANY line
    that does not start a new '(n) ' detail header (ADVICE r12: the
    old [^\\n(]+ pattern broke on Input lines carrying parenthesized
    attribute names like `sum(x)#12`, silently skipping the block)."""
    return {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\b[^\n]*\n(?:(?!\(\d+\) )[^\n]*\n)*?"
            r"Arguments: SinglePartition\b", plan)
    }


def _single_partition_feeds_winsort(plan: str) -> bool:
    """True iff a Window or Sort node consumes an Exchange
    SinglePartition's output — the unpartitioned-window/global-sort
    hazard — in a `formatted`-mode explain string.

    Ancestry, not co-occurrence (ADVICE r11): partition-local Sorts
    from sort-merge joins / sort-based aggregation live on OTHER
    branches of the tree, so they no longer trip the flag. Walk EVERY
    tree section — the main plan and each subquery tree (ADVICE r12):
    for each SinglePartition exchange (ids taken from the detail
    blocks' `Arguments: SinglePartition` lines), collect ancestors —
    lines above with strictly shallower indentation — until the next
    Exchange re-partitions the data; flag if any such ancestor is
    Window/Sort/WindowGroupLimit."""
    single_ids = _single_partition_ids(plan)
    if not single_ids:
        return False
    for tree_lines in _tree_sections(plan):
        for i, (indent, name, node_id) in enumerate(tree_lines):
            if name != "Exchange" or node_id not in single_ids:
                continue
            min_indent = indent
            for a_indent, a_name, _ in reversed(tree_lines[:i]):
                if a_indent >= min_indent:
                    continue
                min_indent = a_indent
                if a_name in ("Window", "Sort", "WindowGroupLimit"):
                    return True
                if a_name == "Exchange":  # re-partitioned — hazard over
                    break
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import flink_realtime_edu_demo_spark.queries  # noqa: F401
    from flink_realtime_edu_demo_spark.registry import QUERIES
    from flink_realtime_edu_demo_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    rows, flags = [], []
    for key in sorted(QUERIES):
        df = QUERIES[key](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        # count only the "(n) Exchange" detail headers — the tree section
        # repeats every node, which would double-count
        n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bcast = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        nested = len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan))
        python = len(
            re.findall(r"BatchEvalPython", plan)
        )  # row-at-a-time Python — always a flag
        arrow = len(re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|"
                               r"FlatMapCoGroupsInPandas|PythonMapInArrow|"
                               r"FlatMapGroupsInPandasWithState|BatchEvalPythonUDTF|ArrowEvalPythonUDTF", plan))
        pushed = "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        )
        rows.append((key, n_exchange, n_bcast, n_smj, nested, arrow, python, pushed))
        if python:
            flags.append(f"- **{key}**: row-at-a-time Python (BatchEvalPython) — forbidden on bench paths")
        if nested and key not in ALLOWED_NESTED_LOOP:
            flags.append(f"- **{key}**: nested-loop/cartesian join outside the allowed set")
        cap = (16 if key in ALLOWED_ITERATIVE
               else 6 if key in ALLOWED_MULTI_GRAIN else 4)
        if n_exchange > cap:
            flags.append(f"- **{key}**: {n_exchange} shuffles — check for a reusable partitioning")
        # formatted mode separates the node header "(n) Exchange" from
        # its partitioning, which lands on an "Arguments:" detail line.
        # A SinglePartition exchange feeding a 1-row FINAL aggregate
        # (TPC-H q6-style scalar folds) moves one partial row per
        # upstream partition — the correct plan at any scale — so the
        # hazard is a Window/Sort node CONSUMING the SinglePartition
        # exchange's output (ADVICE r11: a bare any-Sort co-occurrence
        # also matched partition-local sorts from sort-merge joins and
        # sort-based aggregation, flagging unrelated plans into the
        # allowlist).
        if _single_partition_feeds_winsort(plan) and \
                key not in ALLOWED_SINGLE_PARTITION:
            flags.append(
                f"- **{key}**: Exchange SinglePartition in a plan with "
                "Window/Sort, outside the reduced-input allowlist — "
                "an unpartitioned window/sort over non-reduced data "
                "is a 100 TB killer")

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write("# Physical-plan audit (tools/plan_audit.py)\n\n")
        f.write(f"Audited {len(rows)} queries at {sf_dir}. Columns: shuffle Exchanges "
                "(excl. broadcast), BroadcastHashJoins, SortMergeJoins, nested-loop "
                "joins, Arrow-Python ops, row-Python ops, parquet filter pushdown.\n\n")
        f.write("| query | xchg | bhj | smj | nlj | arrowPy | rowPy | pushdown |\n")
        f.write("| --- | ---: | ---: | ---: | ---: | ---: | ---: | --- |\n")
        for r in rows:
            f.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | {r[5]} | {r[6]} | "
                    f"{'yes' if r[7] else '—'} |\n")
        f.write("\n## Flags\n\n")
        f.write("\n".join(flags) if flags else "None — every plan within budget.\n")
    print(f"PLANS.md written; {len(flags)} flags")
    for fl in flags:
        print(fl)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
