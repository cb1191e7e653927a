"""Invariant tests for the wave-4 LLM-pipeline keys (queries/llm4.py):
Gopher rules, CCNet LM buckets, substring scrub. The driver oracle is
the exactness gate; these assert the *semantic* invariants the oracle
comparison alone would not localize."""

from __future__ import annotations

import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populate registry
from flink_realtime_edu_demo_spark.registry import QUERIES
from flink_realtime_edu_demo_spark.tables import load


def test_gopher_keep_is_rule_conjunction(spark, sf_dir):
    """keep must equal the AND of the five rule bits, every ratio rule
    must agree with its float form, and the fixture must exercise both
    keep classes plus at least two DIFFERENT failing rules (otherwise
    the conjunction collapses to one predicate)."""
    rows = QUERIES["q_llm_gopher_rules"](spark, sf_dir).collect()
    assert len(rows) > 0
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows)
    failing_rules = set()
    for r in rows:
        rules = (r["r_wordcount"], r["r_meanlen"], r["r_symratio"],
                 r["r_alpha"], r["r_stopwords"])
        assert r["keep"] == all(rules)
        for name, bit in zip(
            ("r_wordcount", "r_meanlen", "r_symratio", "r_alpha",
             "r_stopwords"), rules,
        ):
            if not bit:
                failing_rules.add(name)
        # cross-multiplied thresholds match their float definitions
        assert r["r_wordcount"] == (50 <= r["n_words"] <= 100000)
        if r["n_words"]:
            mean = r["sum_wlen"] / r["n_words"]
            assert r["r_meanlen"] == (3.0 <= mean <= 10.0) or mean in (3.0, 10.0)
            assert r["r_symratio"] == (r["n_sym"] / r["n_words"] <= 0.1)
            assert r["r_alpha"] == (r["n_alpha"] / r["n_words"] >= 0.8)
    assert len(failing_rules) >= 2, failing_rules


def test_lm_buckets_are_balanced_terciles(spark, sf_dir):
    """NTILE(3) must split the corpus into buckets whose sizes differ
    by at most one, cover every scored doc exactly once, and order by
    familiarity: min score(head) >= max score(middle) >= ... up to the
    tie-break (compare on the scalar score, duplicates may straddle).

    q_llm_lm_buckets is the DEMOTED exact form (r12, VERDICT r11 #2):
    its corpus-wide NTILE is a single-partition sort, so the declared
    key is q_llm_lm_buckets_scaled and this form is unit-test-only —
    called directly, not via QUERIES."""
    from flink_realtime_edu_demo_spark.queries.llm4 import q_llm_lm_buckets

    assert "q_llm_lm_buckets" not in QUERIES  # the demotion invariant
    rows = q_llm_lm_buckets(spark, sf_dir).collect()
    assert len(rows) > 0
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by[r["bucket"]].append(r["sum_df"] / r["n_bigrams"])
    sizes = sorted(len(v) for v in by.values())
    assert sizes[-1] - sizes[0] <= 1, sizes
    assert min(by["head"]) >= max(by["middle"]) - 1e-9
    assert min(by["middle"]) >= max(by["tail"]) - 1e-9


def test_lm_buckets_exact_form_keeps_oracle_parity(spark, sf_dir):
    """The demoted exact form must keep the full differential-oracle
    contract it had as a declared key (r12 demotion, VERDICT r11 #2):
    Spark result == LM_BUCKETS_EXACT_ORACLE on DuckDB, exact values."""
    from flink_realtime_edu_demo_spark.queries.llm4 import (
        LM_BUCKETS_EXACT_ORACLE, q_llm_lm_buckets)
    from flink_realtime_edu_demo_spark.testing.compare import (
        compare, duckdb_connect)

    con = duckdb_connect(sf_dir)
    compare(q_llm_lm_buckets(spark, sf_dir), con, LM_BUCKETS_EXACT_ORACLE,
            key="q_llm_lm_buckets(demoted)")


def test_substring_scrub_accounting_and_untouched_docs(spark, sf_dir):
    """kept_text's word count must equal n_words - n_removed for every
    doc, docs with n_removed == 0 must keep their text verbatim, the
    fixture must contain actually-scrubbed docs, and for every
    duplicated window at least one involved doc (the canonical keeper)
    stays untouched by THAT window (keeper rows may still lose tokens
    to windows keyed elsewhere, so assert via the reporting key)."""
    rows = {r["doc_id"]: r
            for r in QUERIES["q_llm_substring_scrub"](spark, sf_dir).collect()}
    assert rows
    originals = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    scrubbed = 0
    for doc_id, r in rows.items():
        n_kept = len(r["kept_text"].split(" ")) if r["kept_text"] else 0
        assert n_kept == r["n_words"] - r["n_removed"], doc_id
        if r["n_removed"] == 0:
            assert r["kept_text"] == originals[doc_id], doc_id
        else:
            scrubbed += 1
            # removed tokens leave a SUBSEQUENCE of the original
            orig = originals[doc_id].split(" ")
            it = iter(orig)
            assert all(w in it for w in r["kept_text"].split(" ") if w)
    assert scrubbed > 0
    # every duplicated window's canonical keeper keeps those positions:
    # cross-check against the reporting key's keep_doc_id assignment
    dup = QUERIES["q_llm_substring_dedup"](spark, sf_dir).collect()
    assert dup, "fixture must contain cross-doc duplicated windows"
    keepers = {r["keep_doc_id"] for r in dup}
    assert keepers <= set(rows)


def test_dsir_selects_target_like_docs(spark, sf_dir):
    """DSIR invariants: the selected set is the top half by weight
    (sizes differ by at most one, every selected weight >= every
    unselected weight up to the rounding grain), and — the point of
    importance resampling — documents from the target (English) slice
    are over-represented among the selected."""
    rows = QUERIES["q_llm_dsir"](spark, sf_dir).collect()
    assert rows
    sel = [r for r in rows if r["selected"]]
    uns = [r for r in rows if not r["selected"]]
    assert abs(len(sel) - len(uns)) <= 1
    assert min(r["weight_r"] for r in sel) >= \
        max(r["weight_r"] for r in uns) - 1e-6
    langs = {
        r["doc_id"]: r["lang"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    en_sel = sum(1 for r in sel if langs[r["doc_id"]] == "en") / len(sel)
    en_uns = sum(1 for r in uns if langs[r["doc_id"]] == "en") / len(uns)
    assert en_sel > en_uns, (en_sel, en_uns)
