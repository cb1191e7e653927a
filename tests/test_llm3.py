"""Invariant tests for the wave-3 LLM-pipeline keys (queries/llm3.py):
quality classifier, Bloom decontamination, SemDeDup. The driver oracle
is the exactness gate; these assert the *semantic* invariants the
oracle comparison alone would not localize."""

from __future__ import annotations

import math

import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populate registry
from flink_realtime_edu_demo_spark.registry import QUERIES


def test_quality_clf_decision_is_integer_exact(spark, sf_dir):
    """keep must equal score_x > 0 (integer decision, never float),
    logit_u must be the floored micro-unit quotient, and the fixture
    must exercise BOTH classes (a one-sided label verifies nothing)."""
    rows = QUERIES["q_llm_quality_clf"](spark, sf_dir).collect()
    assert len(rows) > 0
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows)
    for r in rows:
        assert r["keep"] == (r["score_x"] > 0)
        assert r["logit_u"] == math.floor(r["score_x"] * 10000.0 / r["n_words"])


def test_bloom_decontam_superset_of_exact(spark, sf_dir):
    """A Bloom filter has false positives but never false negatives:
    per doc n_bloom_hits >= n_exact_hits, contaminated == bloom>=1,
    and no benchmark doc (doc_id % 97 == 0) appears in the output."""
    rows = QUERIES["q_llm_decontam_bloom"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert all(r["n_bloom_hits"] >= r["n_exact_hits"] for r in rows)
    assert all(r["contaminated"] == (r["n_bloom_hits"] >= 1) for r in rows)
    # the fixtures plant real overlap, so the filter must fire somewhere
    assert any(r["n_bloom_hits"] > 0 for r in rows)


def test_semantic_dedup_keeps_first_seen(spark, sf_dir):
    """SemDeDup prunes against LOWER-id cluster-mates only: the lowest
    vec_id of every cluster has no prune candidate (max_cos_r null,
    is_dup false), every vector appears exactly once, and both classes
    occur."""
    rows = QUERIES["q_llm_semantic_dedup"](spark, sf_dir).collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) > 0
    first_by_cluster = {}
    for r in rows:
        c = r["cluster"]
        if c not in first_by_cluster or r["vec_id"] < first_by_cluster[c]["vec_id"]:
            first_by_cluster[c] = r
    for r in first_by_cluster.values():
        assert r["max_cos_r"] is None and not r["is_dup"]
    dups = sum(1 for r in rows if r["is_dup"])
    assert 0 < dups < len(rows)
    for r in rows:
        if r["max_cos_r"] is not None:
            # rounded surface: compare with half-ulp slack around tau
            assert r["is_dup"] == (r["max_cos_r"] >= 0.30 - 5e-7)


def test_bpe_merge_is_greedy_nonoverlapping(spark, tmp_path):
    """The gaps-and-islands merge must implement greedy left-to-right
    NON-OVERLAPPING pair replacement: 'aaaa' + merge (a,a) yields two
    'aa' symbols (pair count 3 before the merge — all adjacent
    occurrences — but only alternate positions merge), and the merged
    symbol participates in the NEXT iteration's pairs."""
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": [0], "text": ["aaaa aaaa aaaa"], "lang": ["en"],
        "source": ["t"], "n_chars": [14],
    })
    d = str(tmp_path / "bpe")
    import os
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    from flink_realtime_edu_demo_spark.registry import QUERIES as Q
    rows = {r.iter: r for r in Q["q_llm_bpe_merges"](spark, d).collect()}
    # iter 1: pair (a,a) appears 3x per word x 3 word-vocab-count... the
    # vocab is ONE word 'aaaa' with cnt=3, so pair_count = 3 adjacents x 3.
    assert (rows[1].lhs, rows[1].rhs, rows[1].pair_count) == ("a", "a", 9)
    # after merging: 'aaaa' -> [aa, aa]; iter 2 pair is (aa, aa), cnt 3.
    assert (rows[2].lhs, rows[2].rhs, rows[2].pair_count) == ("aa", "aa", 3)
    # iter 3: single symbol 'aaaa' per word -> no pairs... the top-1
    # LIMIT over an empty pair table yields NO row for iters 3-4.
    assert 3 not in rows and 4 not in rows
