"""Extended randomized CEP fuzz: engine vs independent reference
matchers on corpora LARGER than the hypothesis budgets (COVERAGE.md
closing-assurance ledger; VERDICT r10 next-step #7 asked for this to
be a committed, growing harness instead of a per-round one-off).

Families (engine -> reference, both from the per-engine property
suites in tests/test_property.py):

- runagg_chain   match_recognize_runagg (generalized '?'/'+'/{m,n}
                 suffix chains, round 11) vs _py_runagg_spans with the
                 NATIVE-{m,n} _chain_end backtracker
- iterative      match_recognize_iterative (anchor-referencing DEFINE,
                 round 11) vs the context-carrying _py_iterative_spans
- until          match_recognize_until vs the stop-aware
                 _py_until_matches (spans + measures)
- consecutive    match_recognize_consecutive vs the adjacency-aware
                 _py_consec_matches (spans + measures)
- relaxed_groups match_recognize_relaxed_groups vs
                 _py_relaxed_group_spans
- until_define   match_recognize_until_define vs _py_until_matches
                 over the reduced bitmask alphabet (the proven
                 reduction from the property suite)
- followed_by_iterative / not_followed_by_end (round 12)
- mixed_links    match_recognize_relaxed(links=...) vs the link-aware
                 _py_relaxed_matches (round 13 strict next() edges)
- within_step    match_recognize_within_step vs the pointer-chasing
                 _py_within_step_spans (round 13 per-edge within)
- readmit        consume='readmit' vs the event-driven re-admitting
                 reference NFA (round 13 Flink-exact SKIP_PAST_LAST_EVENT)
- relaxed_skip   relaxed linking x to_next_row/to_first/to_last vs
                 _py_relaxed_skip_matches (round 13)
- all_rows_running  RUNNING/FINAL + SUBSET measures recomputed from
                 scratch over _py_match_rows, both engines (round 13)

Deterministic: seeded random.Random; same seed -> same corpora. Exits
nonzero on the first mismatch with the reproducing (family, seed).

Usage: python tools/fuzz_cep.py [per-family-corpora] [seed]
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_spec = importlib.util.spec_from_file_location(
    "ref_matchers", os.path.join(_REPO, "tests", "test_property.py")
)
ref = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref)

from flink_realtime_edu_demo_spark.operators.cep import (  # noqa: E402
    match_recognize_consecutive,
    match_recognize_relaxed,
    match_recognize_followed_by_iterative,
    match_recognize_iterative,
    greedy_pattern,
    match_recognize_not_followed_by_end,
    match_recognize_not_followed_by_interior,
    match_recognize_not_next_end,
    match_recognize_times_combinations,
    match_recognize_not_next,
    match_recognize_relaxed_groups,
    match_recognize_runagg,
    match_recognize_until,
    match_recognize_until_define,
    match_recognize_within_step,
)

from flink_realtime_edu_demo_spark.queries.streaming_batch import (  # noqa: E402
    count_window_slide,
    count_window_tumble,
)

TYPES5 = ["view", "click", "purchase", "error", "signup"]


def _ev(spark, rows_or_types, with_value):
    if with_value:
        data = [(1, i, t, float(v)) for i, (t, v) in enumerate(rows_or_types)]
        schema = "user_id long, event_id long, event_type string, value double"
    else:
        data = [(1, i, t) for i, t in enumerate(rows_or_types)]
        schema = "user_id long, event_id long, event_type string"
    return spark.createDataFrame(data, schema)


def fuzz_runagg_chain(spark, rng):
    rows = [
        (rng.choice(["view", "click", "error"]), rng.randint(-3, 5))
        for _ in range(rng.randint(30, 80))
    ]
    prefix = [
        rng.choice([
            {}, {"dir": "up"}, {"dir": "down"},
            {"types": ("view", "click")}, {"types": ("click",)},
        ])
        for _ in range(rng.randint(0, 2))
    ]
    adef = {
        # round 13: MIN/MAX join the matrix (monotone O(1) per-row
        # lowering in the engine vs the reference's honest recompute)
        "agg": rng.choice(["sum", "avg", "min", "max"]),
        "cmp": rng.choice(["<", "<=", ">", ">="]),
        "thr": float(rng.randint(-2, 8)),
    }
    if rng.random() < 0.3:
        adef["types"] = rng.choice([("view", "click"), ("click", "error")])
    if rng.random() < 0.35:
        # r11b: composed IterativeCondition — anchor-relative conjunct
        # on the aggregate define (disables the monotone fast path);
        # both navigation targets (start row / first loop row)
        adef["anchor_cmp"] = rng.choice(["<", "<=", ">", ">="])
        adef["anchor_factor"] = rng.choice([0.5, 1.0, 1.5, -2.0])
        adef["anchor_ref"] = rng.choice(["start", "first_loop"])
    chain = [
        (
            rng.choice([
                {}, {"types": ("click",)}, {"types": ("view", "error")},
                {"types": ("click", "error")}, {"dir": "up"},
                {"dir": "down"},
            ]),
            rng.choice(["1", "?", "+", "{0,1}", "{1,2}", "{0,2}", "{2,2}",
                        "{2,3}", "{1,3}"]),
        )
        for _ in range(rng.randint(1, 3))
    ]
    aq = rng.choice(["+", "*"])
    chain_min = sum(
        1 if q in ("1", "+") else int(q.strip("{}").split(",")[0])
        if q.startswith("{") else 0
        for _, q in chain
    )
    if aq == "*" and not prefix and chain_min == 0:
        prefix = [{"types": ("view",)}]
    skip = rng.choice(["past_last_row", "to_next_row"])
    pattern = [(f"P{i}", d, "1") for i, d in enumerate(prefix)]
    pattern.append(("B", adef, aq))
    pattern.extend((f"S{i}", d, q) for i, (d, q) in enumerate(chain))
    want = ref._py_runagg_spans(rows, pattern, skip)
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_runagg(
            _ev(spark, rows, True), pattern, ts="event_id", skip=skip
        ).collect()
    )
    assert got == sorted(want), ("runagg_chain", rows, pattern, skip,
                                 got, want)


def fuzz_iterative(spark, rng):
    rows = [
        (rng.choice(["view", "click", "error"]), rng.randint(-3, 6))
        for _ in range(rng.randint(30, 80))
    ]
    anchor = rng.choice([
        {}, {"types": ("view",)}, {"types": ("view", "click")},
        {"dir": "up"},
    ])
    loop = dict(rng.choice(
        [{}, {"types": ("click", "error")}, {"dir": "down"}]))
    loop["cmp"] = rng.choice(["<", "<=", ">", ">="])
    loop["factor"] = rng.choice([0.5, 1.0, 1.1, 2.0, -1.5])
    min_loop = rng.randint(0, 1)
    # r11b: half the corpora add the single-row trigger suffix
    # (PATTERN (A B+ C)) — the greedy-giveback backtracking path
    suffix = rng.choice(
        [None, None, {"types": ("error",)}, {"types": ("click", "error")}])
    skip = rng.choice(["past_last_row", "to_next_row"])
    want = ref._py_iterative_spans(rows, anchor, loop, min_loop, skip,
                                   suffix_def=suffix)
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_iterative(
            _ev(spark, rows, True), anchor, loop, ts="event_id",
            min_loop=min_loop, skip=skip, suffix_def=suffix,
        ).collect()
    )
    assert got == sorted(want), ("iterative", rows, anchor, loop,
                                 min_loop, suffix, skip, got, want)


def _until_pattern(rng):
    first_t = rng.choice(["view", "signup", "purchase"])
    loop_t = rng.choice(
        ["click", "view", ("click", "view"), ("click", "purchase")])
    loop_types = (loop_t,) if isinstance(loop_t, str) else loop_t
    loop_q = rng.choice(
        ["+", "+?", "*", "*?", "{1,2}", "{2,3}", "{2,3}?", "{2,}",
         "{2,}?"])
    stop_t = rng.choice([t for t in TYPES5 if t not in loop_types])
    tail = rng.choice(
        [None, ("purchase", "1"), ("error", "?"),
         (("purchase", "error"), "+")])
    pat = [("A", first_t, "1"), ("B", loop_t, loop_q, stop_t)]
    if tail is not None:
        pat.append(("C", tail[0], tail[1]))
    return pat


def fuzz_until(spark, rng):
    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 120))]
    pat = _until_pattern(rng)
    plain = [el[:3] for el in pat]
    until = {i: (el[3],) for i, el in enumerate(pat) if len(el) > 3}
    want = [
        (s, e, sum(cs), (e - s) - sum(cs), tuple(cs))
        for s, e, cs in ref._py_until_matches(types, plain, until)
    ]
    got = sorted(
        (
            r.first_event_id, r.last_event_id + 1, r.n_rows, r.n_skipped,
            tuple(r[f"n_{v.lower()}"] for v, _, _ in plain),
        )
        for r in match_recognize_until(
            _ev(spark, types, False), pat, ts="event_id"
        ).collect()
    )
    assert got == sorted(want), ("until", types, pat, got, want)


def fuzz_consecutive(spark, rng):
    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 120))]
    first = rng.choice(
        [None, ("view", "1"), ("signup", "1"), ("view", "{1,2}")])
    loop_t = rng.choice(
        ["click", "view", ("click", "view"), ("click", "error")])
    loop_q = rng.choice(
        ["+", "+?", "*", "*?", "{1,2}", "{2,3}", "{0,2}", "{2,3}?",
         "{2,}"])
    tail = rng.choice(
        [None, ("purchase", "1"), ("error", "?"), ("purchase", "+")])
    pat = []
    if first is not None:
        pat.append(("A", first[0], first[1]))
    pat.append(("B", loop_t, loop_q))
    if tail is not None:
        pat.append(("C", tail[0], tail[1]))
    if ref._parse_quant(pat[0][2])[0] < 1:
        pat.insert(0, ("Z", "signup", "1"))
    want = [
        (s, e, sum(cs), (e - s) - sum(cs), tuple(cs))
        for s, e, cs in ref._py_consec_matches(types, pat, {"B"})
    ]
    got = sorted(
        (
            r.first_event_id, r.last_event_id + 1, r.n_rows, r.n_skipped,
            tuple(r[f"n_{v.lower()}"] for v, _, _ in pat),
        )
        for r in match_recognize_consecutive(
            _ev(spark, types, False), pat, {"B"}, ts="event_id"
        ).collect()
    )
    assert got == sorted(want), ("consecutive", types, pat, got, want)


def fuzz_relaxed_groups(spark, rng):
    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 100))]
    # mirror grouped_pattern_strategy's shapes: var/group mixes with
    # quantified inner variables, first flattened variable mandatory
    def var_el():
        return ("var",
                rng.choice(["view", "click", ("click", "view"),
                            "purchase", ("purchase", "error")]),
                rng.choice(["1", "+", "?", "{1,2}"]))

    def grp_el():
        body = [
            (rng.choice(["click", "view", ("click", "error"), "purchase"]),
             rng.choice(["1", "1", "+", "{1,2}"]))
            for _ in range(rng.randint(1, 2))
        ]
        return ("grp", body, rng.choice(["+", "{1,2}", "{1,3}", "+?"]))

    for _ in range(50):
        els = []
        for _ in range(rng.randint(1, 3)):
            els.append(grp_el() if rng.random() < 0.5 else var_el())
        if not any(t == "grp" for t, _, _ in els):
            els[rng.randrange(len(els))] = grp_el()
        if ref._relaxed_grp_first_ok(els):
            break
    else:
        return  # no valid pattern drawn; skip this corpus
    pattern, vi = [], 0
    for gi, (tag, body, q) in enumerate(els):
        if tag == "grp":
            inner = []
            for t, iq in body:
                inner.append((f"V{vi}", t, iq))
                vi += 1
            pattern.append((f"G{gi}", inner, q))
        else:
            pattern.append((f"V{vi}", body, q))
            vi += 1
    want = ref._py_relaxed_group_spans(types, pattern)
    got = sorted(
        (r.first_event_id, r.last_event_id + 1)
        for r in match_recognize_relaxed_groups(
            _ev(spark, types, False), pattern, ts="event_id"
        ).collect()
    )
    assert got == [(s, e) for s, e in want], ("relaxed_groups", types,
                                              pattern, got, want)


def fuzz_until_define(spark, rng):
    rows = [
        (rng.choice(["view", "click", "purchase"]), rng.randint(0, 3))
        for _ in range(rng.randint(30, 70))
    ]
    first = rng.choice([
        {"types": "view"}, {"types": ("view", "purchase")}, {"dir": "up"},
    ])
    loop = rng.choice([
        {"types": "click"}, {"types": ("view", "click")},
        {"dir": "up"}, {},
    ])
    loop_q = rng.choice(["+", "+?", "*", "{1,2}", "{2,3}?"])
    stop = rng.choice([
        {"types": "purchase"}, {"dir": "down"},
        {"types": "click", "dir": "down"},
    ])
    tail = rng.choice([None, ({"types": "purchase"}, "1"), ({}, "?")])
    pat = [("A", first, "1"), ("B", loop, loop_q, stop)]
    if tail is not None:
        pat.append(("C", tail[0], tail[1]))
    plain = [el[:3] for el in pat]
    i_u = next(i for i, el in enumerate(pat) if len(el) == 4)
    ext = plain + [("__STOP", stop, "1")]
    k = len(plain)
    toks = []
    for i, (t, v) in enumerate(rows):
        prev = rows[i - 1][1] if i > 0 else None
        bm = 0
        for vi2, (_, d, _) in enumerate(ext):
            ok = True
            if d.get("types"):
                tt = (d["types"],) if isinstance(d["types"], str) \
                    else tuple(d["types"])
                ok = ok and t in tt
            if d.get("dir") == "up":
                ok = ok and prev is not None and v > prev
            elif d.get("dir") == "down":
                ok = ok and prev is not None and v < prev
            if ok:
                bm |= 1 << vi2
        toks.append(chr(97 + bm))
    classes = [
        tuple(chr(97 + m) for m in range(1 << (k + 1)) if m & (1 << i))
        for i in range(k + 1)
    ]
    stop_chars = set(classes[k])
    ref_plain = []
    for i, (_, _, q) in enumerate(plain):
        cls = classes[i]
        if i == i_u:
            cls = tuple(c for c in cls if c not in stop_chars)
        ref_plain.append((f"V{i}", cls, q))
    want = [
        (s, e, sum(cs), (e - s) - sum(cs), tuple(cs))
        for s, e, cs in ref._py_until_matches(
            toks, ref_plain, {i_u: classes[k]})
    ]
    pattern = [
        (f"V{i}", d, q) if i != i_u else (f"V{i}", d, q, stop)
        for i, (_, d, q) in enumerate(plain)
    ]
    got = sorted(
        (
            r.first_event_id, r.last_event_id + 1, r.n_rows, r.n_skipped,
            tuple(r[f"n_v{i}"] for i in range(k)),
        )
        for r in match_recognize_until_define(
            _ev(spark, rows, True), pattern, ts="event_id"
        ).collect()
    )
    assert got == sorted(want), ("until_define", rows, pattern, got, want)


def _ts_ev(spark, rows):
    """rows = [(type, value, ts_minutes)] -> events frame with real
    timestamps (the within-bound families need time arithmetic)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t, float(v))
         for i, (t, v, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    )


def fuzz_followed_by_iterative(spark, rng):
    """Round 12: IterativeCondition under RELAXED linking vs the
    context-carrying relaxed reference NFA — comparators, negative
    factors, own-row loop types, min_loop 1-3, the .within() bound,
    both skip modes, n_loop/n_skipped/last_loop_value measures."""
    acc, rows = 0, []
    for _ in range(rng.randint(30, 80)):
        acc += rng.randint(0, 40)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     rng.randint(-3, 6), acc))
    anchor = rng.choice([
        {}, {"types": ("view",)}, {"types": ("view", "click")},
        {"dir": "up"},
    ])
    loop = dict(rng.choice([{}, {"types": ("click", "error")}]))
    loop["cmp"] = rng.choice(["<", "<=", ">", ">="])
    loop["factor"] = rng.choice([0.5, 1.0, 1.1, 2.0, -1.5])
    if rng.random() < 0.4:  # r12b: previously-accepted-event reference
        loop["ref"] = "prev"
    min_loop = rng.randint(1, 3)
    w = rng.choice([None, 15, 60, 240])
    # round 13: the per-edge PREVIOUS_AND_CURRENT bound joins the draw
    # (crossed with refs, emit modes, and the whole-pattern within)
    ws = rng.choice([None, None, 15, 45, 120])
    emit = rng.choice(["greedy", "greedy", "all_prefixes"])
    skip = ("to_next_row" if emit == "all_prefixes"
            else rng.choice(["past_last_row", "to_next_row"]))
    want = sorted(
        (j, e, nl, nsk, float(rows[e][1]))
        for j, e, nl, nsk in ref._py_followed_by_iterative_spans(
            rows, anchor, loop, min_loop, skip, within=w, emit=emit,
            within_step=ws)
    )
    got = sorted(
        (r.first_event_id, r.last_event_id, r.n_loop, r.n_skipped,
         r.last_loop_value)
        for r in match_recognize_followed_by_iterative(
            _ts_ev(spark, rows), anchor, loop, min_loop=min_loop,
            skip=skip, within_minutes=w, emit=emit,
            within_step_minutes=ws,
        ).collect()
    )
    assert got == want, ("followed_by_iterative", rows, anchor, loop,
                         min_loop, w, ws, skip, emit, got, want)


def fuzz_not_followed_by_end(spark, rng):
    """Round 12: trailing notFollowedBy + within vs the forbid filter
    composed over the independent relaxed-within reference."""
    acc, rows = 0, []
    for _ in range(rng.randint(25, 70)):
        acc += rng.randint(0, 40)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     acc))
    pat = rng.choice([
        [("view", "1")],
        [("view", "1"), ("click", "+")],
        [("view", "1"), (("click", "purchase"), "?"), ("click", "1")],
    ])
    fbt = rng.choice([("purchase",), ("error",), ("purchase", "error")])
    w = rng.choice([15, 60, 240])
    pattern = [(f"V{i}", t, q) for i, (t, q) in enumerate(pat)]
    want = []
    for s, e, cs in ref._py_relaxed_within(rows, pattern, w):
        last = e - 1
        killed = any(
            rows[f][0] in fbt and rows[f][1] <= rows[s][1] + w
            for f in range(last + 1, len(rows))
        )
        if not killed:
            want.append((s, last))
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t)
         for i, (t, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_not_followed_by_end(
            ev, pattern, fbt, w).collect()
    )
    assert got == sorted(want), ("not_followed_by_end", rows, pat, fbt,
                                 w, got, want)


def fuzz_mixed_links(spark, rng):
    """Round 13 (VERDICT r12 next #4): mixed strict/relaxed edges —
    random relaxed patterns where a random subset of mandatory
    non-first variables carries a strict next() edge, vs the
    link-aware _py_relaxed_matches reference."""
    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 120))]
    k = rng.randint(2, 4)
    pattern = []
    for i in range(k):
        # the first variable must be POSITIVE and mandatory (relaxed
        # plan rules: the anchor atom can't be a complement class and
        # min rows >= 1) — later variables draw the full space
        etype = rng.choice(
            ["view", "click", ("view", "click"), ("purchase", "error")]
            if i == 0 else [
                "view", "click", ("view", "click"), ("purchase", "error"),
                ("!", "error"), ("!", "view", "signup"),
            ])
        quant = rng.choice(["1", "1", "+", "?", "{1,2}", "{2,3}", "+?"])
        if i == 0 and quant in ("?",):
            quant = "1"
        pattern.append((f"V{i}", etype, quant))
    eligible = [v for i, (v, _, q) in enumerate(pattern)
                if i > 0 and ref._parse_quant(q)[0] >= 1]
    links = frozenset(v for v in eligible if rng.random() < 0.6)
    want = [
        (s, e, sum(cs), (e - s) - sum(cs), tuple(cs))
        for s, e, cs in ref._py_relaxed_matches(types, pattern, links)
    ]
    got = sorted(
        (
            r.first_event_id, r.last_event_id + 1, r.n_rows, r.n_skipped,
            tuple(r[f"n_v{i}"] for i in range(len(pattern))),
        )
        for r in match_recognize_relaxed(
            _ev(spark, types, False), pattern, ts="event_id", links=links
        ).collect()
    )
    assert got == sorted(want), ("mixed_links", types, pattern, links,
                                 got, want)


def fuzz_within_step(spark, rng):
    """Round 13 (VERDICT r12 next #3): per-edge within
    (PREVIOUS_AND_CURRENT) — random single-occurrence chains over
    timestamped corpora vs the pointer-chasing reference, both AFTER
    MATCH modes, closed-boundary edges included."""
    import datetime as dt

    n = rng.randint(40, 120)
    acc = 0
    rows = []
    for _ in range(n):
        acc += rng.randint(0, 30)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     acc))
    k = rng.randint(2, 4)
    vars_ = [rng.choice([
        "view", "click", "purchase", ("view", "click"),
        ("purchase", "error"), ("!", "error"), ("!", "view", "click"),
    ]) for _ in range(k)]
    pattern = [(f"V{i}", t, "1") for i, t in enumerate(vars_)]
    w = rng.choice([15, 30, 60, 240])
    skip = rng.choice(["past_last_row", "to_next_row"])
    want = ref._py_within_step_spans(rows, pattern, w, skip)
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t)
         for i, (t, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_within_step(
            ev, pattern, w, skip=skip).collect()
    )
    assert got == sorted(want), ("within_step", rows, vars_, w, skip,
                                 got, want)


def fuzz_readmit(spark, rng):
    """Round 13 (VERDICT r12 next #1): Flink-NFA-exact re-admission
    (consume='readmit') vs the independent event-driven re-admitting
    reference NFA — overlapping emissions from surviving anchors,
    completion-ordered pruning, ref='prev' chains, within bounds."""
    import datetime as dt

    acc, rows = 0, []
    for _ in range(rng.randint(40, 100)):
        acc += rng.randint(0, 40)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     rng.randint(-3, 6), acc))
    anchor = rng.choice([
        {}, {"types": ("view",)}, {"types": ("view", "click")},
        {"dir": "up"},
    ])
    loop = dict(rng.choice([{}, {"types": ("click", "error")}]))
    loop["cmp"] = rng.choice(["<", "<=", ">", ">="])
    loop["factor"] = rng.choice([0.5, 1.0, 1.1, 2.0, -1.5])
    if rng.random() < 0.4:
        loop["ref"] = "prev"
    min_loop = rng.randint(1, 3)
    w = rng.choice([60, 240, 720])
    want = sorted(
        (j, e, nl, nsk, float(rows[e][1]))
        for j, e, nl, nsk in ref._py_readmit_spans(
            rows, anchor, loop, min_loop, within=w)
    )
    got = sorted(
        (r.first_event_id, r.last_event_id, r.n_loop, r.n_skipped,
         r.last_loop_value)
        for r in match_recognize_followed_by_iterative(
            _ts_ev(spark, rows), anchor, loop, min_loop=min_loop,
            within_minutes=w, consume="readmit",
        ).collect()
    )
    assert got == want, ("readmit", rows, anchor, loop, min_loop, w,
                         got, want)


def fuzz_relaxed_skip(spark, rng):
    """Round 13 (VERDICT r12 next #2): relaxed linking × the
    variable-targeted AFTER MATCH modes (to_next_row / to_first /
    to_last) vs the reference fold over the consuming attempt."""
    from flink_realtime_edu_demo_spark.operators.cep import (
        _parse_skip, _var_negated,
    )

    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 120))]
    k = rng.randint(2, 4)
    pattern = []
    for i in range(k):
        # positive, mandatory first variable (relaxed plan rules)
        etype = rng.choice(
            ["view", "click", ("view", "click"), ("purchase", "error")]
            if i == 0 else [
                "view", "click", ("view", "click"), ("purchase", "error"),
                ("!", "error"),
            ])
        quant = rng.choice(["1", "1", "+", "?", "{1,2}", "{2,3}"])
        if i == 0 and quant == "?":
            quant = "1"
        pattern.append((f"V{i}", etype, quant))
    mode = rng.choice(["to_next_row", "to_first", "to_last"])
    if mode == "to_next_row":
        skip, target = "to_next_row", None
    else:
        cands = [i for i, (_, t, _) in enumerate(pattern)
                 if not _var_negated(t)]
        if not cands:
            return
        j = rng.choice(cands)
        skip = f"{mode}:V{j}"
        try:
            _, target = _parse_skip(skip, pattern)
        except ValueError:
            return  # statically-rejected non-advancing skip
    want = sorted(
        (s, e, sum(cs), (e - s) - sum(cs), tuple(cs))
        for s, e, cs in ref._py_relaxed_skip_matches(
            types, pattern, mode, target)
    )
    got = sorted(
        (
            r.first_event_id, r.last_event_id + 1, r.n_rows, r.n_skipped,
            tuple(r[f"n_v{i}"] for i in range(len(pattern))),
        )
        for r in match_recognize_relaxed(
            _ev(spark, types, False), pattern, ts="event_id", skip=skip
        ).collect()
    )
    assert got == want, ("relaxed_skip", types, pattern, skip, got, want)


def fuzz_all_rows_running(spark, rng):
    """Round 13 (VERDICT r12 next #6): the r12 measure-composition
    layer as a first-class family — RUNNING/FINAL measures + SUBSET
    union variables recomputed from scratch over the base ALL-ROWS
    reference parse (_py_match_rows), across BOTH engines ('types'
    and the PREV/NEXT DEFINE decode with type-only conditions)."""
    from flink_realtime_edu_demo_spark.operators.cep import (
        match_recognize_all_rows_running,
    )

    rows = [
        (rng.choice(TYPES5), rng.randint(-3, 9))
        for _ in range(rng.randint(40, 100))
    ]
    k = rng.randint(2, 3)
    pattern = []
    for i in range(k):
        etype = rng.choice([
            "view", "click", ("view", "click"), ("purchase", "error"),
            ("click", "signup"),
        ])
        quant = rng.choice(["1", "1", "+", "?", "{1,2}"])
        pattern.append((f"V{i}", etype, quant))
    if sum(ref._parse_quant(q)[0] for _, _, q in pattern) == 0:
        pattern[0] = (pattern[0][0], pattern[0][1], "1")
    engine = rng.choice(["types", "define"])
    names = [v for v, _, _ in pattern]
    sub = None
    if rng.random() < 0.7:
        sub = {"u": tuple(rng.sample(names, rng.randint(1, len(names))))}
    matches = ref._py_match_rows([t for t, _ in rows], pattern)
    want = []
    for mi, match in enumerate(matches, 1):
        vals = [rows[idx][1] for _, idx in match]
        tot, cnt = sum(vals), len(vals)
        run = 0
        for ri, (vname, idx) in enumerate(match, 1):
            run += vals[ri - 1]
            rec = [mi, ri, vname, idx, ri, float(run),
                   float(run) / ri, cnt, float(tot)]
            if sub:
                mem = sub["u"]
                rcnt = sum(1 for v2, _ in match[:ri] if v2 in mem)
                msum = [rows[i2][1] for v2, i2 in match if v2 in mem]
                rec += [rcnt, float(sum(msum)) if msum else None]
            want.append(tuple(rec))
    if engine == "define":
        epat = [(v, {"types": (t,) if isinstance(t, str) else tuple(t)}, q)
                for v, t, q in pattern]
    else:
        epat = pattern
    ev = _ev(spark, rows, True)
    out = match_recognize_all_rows_running(
        ev, epat, subsets=sub, ts="event_id", engine=engine)
    cols = ["match_no", "row_in_match", "classifier", "event_id",
            "running_cnt", "running_sum", "running_avg",
            "final_cnt", "final_sum"]
    if sub:
        cols += ["n_u_running", "sum_u_final"]
    got = sorted(
        tuple(r[c].lower() if c == "classifier" else r[c] for c in cols)
        for r in out.collect()
    )
    want = sorted(
        tuple(v.lower() if isinstance(v, str) else v for v in rec)
        for rec in want
    )
    assert got == want, ("all_rows_running", rows, pattern, engine, sub,
                         got, want)


def fuzz_not_next_end(spark, rng):
    """Round 13: trailing notNext (non-consuming strict absence) vs
    the positional reference — both skips, end-of-partition
    confirmation, witness rows re-anchoring."""
    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 120))]
    k = rng.randint(1, 3)
    vars_ = [rng.choice([
        "view", "click", "purchase", ("view", "click"),
        ("purchase", "error"), ("!", "error"), ("!", "view", "click"),
    ]) for _ in range(k)]
    pattern = [(f"V{i}", t, "1") for i, t in enumerate(vars_)]
    forbid = rng.choice([("error",), ("error", "signup"), ("purchase",)])
    skip = rng.choice(["past_last_row", "to_next_row"])
    want = ref._py_not_next_end_spans(types, pattern, forbid, skip)
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_not_next_end(
            _ev(spark, types, False), pattern, forbid,
            ts="event_id", skip=skip).collect()
    )
    assert got == sorted(want), ("not_next_end", types, vars_, forbid,
                                 skip, got, want)


def fuzz_not_next_quant(spark, rng):
    """Round 16: trailing notNext after a QUANTIFIED tail variable vs
    the positional reference — random prefix lengths 0-2, '+'/'{m,}'/
    '{m,n}' tails, forbid classes overlapping the run class (the
    no-giveback rule), both skips."""
    import datetime as dt

    types = [rng.choice(TYPES5) for _ in range(rng.randint(30, 90))]
    k1 = rng.randint(0, 2)
    classes = ["view", "click", ("view", "click"),
               ("!", "error"), ("purchase", "error")]
    pattern = [(f"V{i}", rng.choice(classes), "1") for i in range(k1)]
    lo = rng.randint(1, 2)
    tail = rng.choice(["+", f"{{{lo},}}", f"{{{lo},{lo + rng.randint(0, 2)}}}"])
    pattern.append(("B", rng.choice(["click", ("click", "error")]),
                    tail))
    forbid = rng.choice(["error", ("error", "signup"), "purchase",
                         ("click", "error")])
    skip = rng.choice(["past_last_row", "to_next_row"])
    want = ref._py_not_next_quant(types, pattern, forbid, skip)
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=i), t)
         for i, t in enumerate(types)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = sorted(
        (r.match_no, r.first_event_id, r.last_event_id, r.n_rows)
        for r in match_recognize_not_next_end(
            ev, pattern, forbid, skip=skip).collect()
    )
    assert got == want, ("not_next_quant", types, pattern, forbid,
                         skip, got, want)


def fuzz_not_next_interior(spark, rng):
    """Round 14 (VERDICT r13 missing #4): generalized non-consuming
    notNext — interior AND trailing edges, with the forbid class
    FORCED to overlap the next variable's admit class on at least one
    interior edge (the case where the non-consuming form observably
    differs from the consuming complement), vs the positional
    reference."""
    types = [rng.choice(TYPES5) for _ in range(rng.randint(40, 120))]
    k = rng.randint(2, 3)
    vars_ = [rng.choice([
        "view", "click", "purchase", ("view", "click"),
        ("purchase", "error"), ("!", "error"), ("!", "view", "click"),
    ]) for _ in range(k)]
    pattern = [(f"V{i}", t, "1") for i, t in enumerate(vars_)]
    # one guaranteed-overlapping interior edge: forbid a type the NEXT
    # variable admits (complement classes admit everything else, so
    # pick any type outside the complement set)
    i = rng.randint(0, k - 2)
    nxt = vars_[i + 1]
    if isinstance(nxt, tuple) and nxt[0] == "!":
        admit = [t for t in TYPES5 if t not in nxt[1:]]
    elif isinstance(nxt, tuple):
        admit = list(nxt)
    else:
        admit = [nxt]
    not_next = {f"V{i}": (rng.choice(admit),)}
    # optionally a second, independent edge (may be trailing)
    if rng.random() < 0.5:
        j = rng.randint(0, k - 1)
        not_next.setdefault(
            f"V{j}", tuple(rng.sample(TYPES5, rng.randint(1, 2))))
    skip = rng.choice(["past_last_row", "to_next_row"])
    want = ref._py_not_next_spans(types, pattern, not_next, skip)
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_not_next(
            _ev(spark, types, False), pattern, not_next,
            ts="event_id", skip=skip).collect()
    )
    assert got == sorted(want), ("not_next_interior", types, vars_,
                                 not_next, skip, got, want)


def fuzz_within_step_links(spark, rng):
    """Round 14 (VERDICT r13 next #9, mixed_links x within_step):
    random strict-edge subsets under the per-edge within bound vs the
    link-aware pointer-chasing reference — strict pointers must be
    'row prev+1 if it admits', relaxed ones first-admitting-after,
    both under the same closed time bound."""
    import datetime as dt

    n = rng.randint(40, 120)
    acc = 0
    rows = []
    for _ in range(n):
        acc += rng.randint(0, 30)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     acc))
    k = rng.randint(2, 4)
    vars_ = [rng.choice([
        "view", "click", "purchase", ("view", "click"),
        ("purchase", "error"), ("!", "error"), ("!", "view", "click"),
    ]) for _ in range(k)]
    pattern = [(f"V{i}", t, "1") for i, t in enumerate(vars_)]
    links = {f"V{i}" for i in range(1, k) if rng.random() < 0.5}
    if not links:
        links = {f"V{rng.randint(1, k - 1)}"}
    w = rng.choice([15, 30, 60, 240])
    skip = rng.choice(["past_last_row", "to_next_row"])
    want = ref._py_within_step_spans(rows, pattern, w, skip, links)
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t)
         for i, (t, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = sorted(
        (r.first_event_id, r.last_event_id)
        for r in match_recognize_within_step(
            ev, pattern, w, skip=skip, links=links).collect()
    )
    assert got == sorted(want), ("within_step_links", rows, vars_,
                                 links, w, skip, got, want)


def fuzz_nfb_interior(spark, rng):
    """Round 15 (VERDICT r14 missing #5): interior non-consuming
    notFollowedBy + within vs the gap-checking reference — random
    mandatory-endpoint patterns, 1-2 edges, forbid classes drawn to
    include the observability case (forbid in the successor's skip
    class) and the boundary-exclusion case (forbid == the successor's
    own type)."""
    import datetime as dt

    acc, rows = 0, []
    for _ in range(rng.randint(30, 90)):
        acc += rng.randint(0, 40)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     acc))
    k = rng.randint(2, 3)
    pool = ["view", "click", "purchase", ("view", "click"),
            ("purchase", "error")]
    pattern = [(f"V{i}", rng.choice(pool),
                rng.choice(["1", "1", "+", "{1,2}"]))
               for i in range(k)]
    edges = {}
    n_edges = rng.randint(1, min(2, k - 1))
    for j in rng.sample(range(k - 1), n_edges):
        edges[f"V{j}"] = tuple(
            rng.sample(["view", "click", "purchase", "error"],
                       rng.randint(1, 2)))
    w = rng.choice([15, 60, 240])
    want = [
        (i + 1, s, e - 1, sum(cs))
        for i, (s, e, cs) in enumerate(ref._py_nfb_interior(
            rows, pattern,
            {int(v[1:]): t for v, t in edges.items()}, w))
    ]
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t)
         for i, (t, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = sorted(
        (r.match_no, r.first_event_id, r.last_event_id, r.n_rows)
        for r in match_recognize_not_followed_by_interior(
            ev, pattern, edges, w).collect()
    )
    assert got == want, ("nfb_interior", rows, pattern, edges, w,
                         got, want)


def fuzz_greedy(spark, rng):
    """Round 15 (VERDICT r14 missing #4): the Pattern-API greedy()
    desugar — random Flink-vocabulary patterns with at least one
    choice-bearing loop whose class overlaps its successor's, random
    greedy marks; the desugared pattern must (a) satisfy the rewrite
    law (marked kept greedy, unmarked-overlap lowered to reluctant)
    and (b) run through the relaxed engine to exactly the reference
    matcher's spans + counts."""
    types = [rng.choice(TYPES5) for _ in range(rng.randint(30, 100))]
    k = rng.randint(2, 3)
    pattern = []
    for i in range(k):
        if i == k - 2:
            # force one overlapping loop somewhere observable
            etype = rng.choice([("click", "error"), ("view", "error"),
                                ("click", "purchase", "error")])
            quant = rng.choice(["+", "*", "{1,2}", "{2,3}"])
            if i == 0 and quant == "*":
                quant = "+"
        elif i == k - 1:
            etype = rng.choice(["error", ("error", "click")])
            quant = "1"
        else:
            etype = rng.choice(["view", "click", ("view", "click")])
            quant = rng.choice(["1", "1", "+"])
        pattern.append((f"V{i}", etype, quant))
    from flink_realtime_edu_demo_spark.operators.cep import (
        _classes_overlap, _quant_parse,
    )
    eligible = []
    for i, (v, t, q) in enumerate(pattern[:-1]):
        lo, hi, lazy = _quant_parse(q)
        if (hi is None or hi > lo) and not lazy:
            eligible.append(v)
    marks = {v for v in eligible if rng.random() < 0.5}
    des = greedy_pattern(pattern, marks)
    for (v, t, q), (v2, t2, q2) in zip(pattern, des):
        assert (v, t) == (v2, t2)
        i = [x[0] for x in pattern].index(v)
        lo, hi, lazy = _quant_parse(q)
        should_flip = (v not in marks and (hi is None or hi > lo)
                       and not lazy and i < k - 1
                       and _classes_overlap(t, pattern[i + 1][1]))
        assert q2 == (q + "?" if should_flip else q), (pattern, marks, des)
    want = [
        (s, e, sum(cs), tuple(cs))
        for s, e, cs in ref._py_relaxed_matches(types, des)
    ]
    got = sorted(
        (
            r.first_event_id, r.last_event_id + 1, r.n_rows,
            tuple(r[f"n_v{i}"] for i in range(k)),
        )
        for r in match_recognize_relaxed(
            _ev(spark, types, False), des, ts="event_id").collect()
    )
    assert got == sorted(want), ("greedy", types, pattern, marks, des,
                                 got, want)


def fuzz_times_combinations(spark, rng):
    """Round 15: times(m,n).allowCombinations() vs the direct
    itertools enumerator — random anchor/loop/close classes (loop
    overlapping the close half the time), k ranges incl. n=3 where
    endpoint tuples collide (multiset comparison, match_no excluded
    there by design — the docstring's documented caveat)."""
    import datetime as dt

    acc, rows = 0, []
    for _ in range(rng.randint(25, 70)):
        acc += rng.randint(0, 40)
        rows.append((rng.choice(["view", "click", "purchase", "error"]),
                     acc))
    lt = rng.choice(["click", ("click", "error"), ("click", "purchase")])
    lo = rng.randint(1, 2)
    hi = rng.randint(lo, 3)
    pattern = [("V", "view", "1"), ("L", lt, f"{{{lo},{hi}}}"),
               ("P", "purchase", "1")]
    w = rng.choice([15, 60, 240])
    want = sorted(ref._py_times_combinations(rows, pattern, w))
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t)
         for i, (t, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = sorted(
        (r.first_event_id, r.loop_first_id, r.loop_last_id, r.n_loop,
         r.last_event_id)
        for r in match_recognize_times_combinations(
            ev, pattern, w).collect()
    )
    assert got == want, ("times_combinations", rows, pattern, w,
                         got, want)


def fuzz_combinations_chain(spark, rng):
    """Round 16: the generalized combinations engine — random
    single-occurrence prefix/suffix chains (lengths 0-2 each, total
    pattern 3-5 variables) around one interior {m,n} loop, random
    overlapping classes, vs the chain-aware enumerator."""
    import datetime as dt

    acc, rows = 0, []
    for _ in range(rng.randint(25, 60)):
        acc += rng.randint(0, 40)
        rows.append((rng.choice(["view", "click", "signup",
                                 "purchase", "error"]), acc))
    classes = ["click", "signup", "purchase", "error",
               ("click", "error"), ("signup", "purchase"),
               ("click", "signup")]
    lo = rng.randint(1, 2)
    hi = rng.randint(lo, 3)
    n_pre = rng.randint(0, 2)
    n_suf = rng.randint(1, 2)  # the close is mandatory (loop never last)
    names = iter("XYZWQ")
    pattern = [("V", "view", "1")]
    for _ in range(n_pre):
        pattern.append((next(names), rng.choice(classes), "1"))
    pattern.append(("L", rng.choice(classes), f"{{{lo},{hi}}}"))
    for _ in range(n_suf):
        pattern.append((next(names), rng.choice(classes), "1"))
    w = rng.choice([30, 120, 400])
    want = ref._py_combinations_chain(rows, pattern, w)
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, i, t0 + dt.timedelta(minutes=m), t)
         for i, (t, m) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    got = ref._chain_tuples(
        match_recognize_times_combinations(ev, pattern, w).collect(),
        pattern)
    assert got == want, ("combinations_chain", rows, pattern, w,
                         got, want)


def _py_count_windows(rows_by_key, size, slide=None):
    """Reference for keyed count windows: rows_by_key maps key ->
    [(event_id, cents)] in arrival order. Tumbling (slide None):
    complete size-chunks -> (key, wid, n, first, last, cents).
    Sliding: fire at every slide-th element with the last
    min(size, seen) elements."""
    out = []
    for k, rows in rows_by_key.items():
        if slide is None:
            for wid in range(len(rows) // size):
                chunk = rows[wid * size:(wid + 1) * size]
                out.append((k, wid, size, chunk[0][0], chunk[-1][0],
                            sum(c for _, c in chunk)))
        else:
            for pos in range(slide, len(rows) + 1, slide):
                chunk = rows[max(0, pos - size):pos]
                out.append((k, pos // slide, len(chunk), chunk[0][0],
                            chunk[-1][0], sum(c for _, c in chunk)))
    return sorted(out)


def fuzz_count_windows(spark, rng):
    """Round 14 (VERDICT r13 next #2): keyed count windows at random
    (size, slide) vs the Python chunking/ring-buffer reference —
    complete-window-only firing (tumble), ramp-up firings (slide),
    and the exact-decimal totals (integer-cents reference)."""
    from decimal import ROUND_HALF_UP, Decimal

    import datetime as dt

    n = rng.randint(40, 150)
    n_keys = rng.randint(1, 4)
    t0 = dt.datetime(2024, 1, 1)
    data = []
    rows_by_key = {}
    for i in range(n):
        k = rng.randint(1, n_keys)
        v = round(rng.uniform(-20, 100), rng.randint(0, 4))
        data.append((k, i, t0 + dt.timedelta(minutes=i), float(v)))
        cents = int(Decimal(repr(float(v))).quantize(
            Decimal("0.01"), ROUND_HALF_UP) * 100)
        rows_by_key.setdefault(k, []).append((i, cents))
    ev = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp_ntz, value double")
    size = rng.randint(2, 6)
    want = _py_count_windows(rows_by_key, size)
    got = sorted(
        (r.user_id, r.wid, r.n, r.first_event_id, r.last_event_id,
         int(round(r.total_value * 100)))
        for r in count_window_tumble(ev, size).collect()
    )
    assert got == want, ("count_tumble", data, size, got, want)
    slide = rng.randint(1, 4)
    want_s = _py_count_windows(rows_by_key, size, slide)
    got_s = sorted(
        (r.user_id, r.fire_no, r.n, r.first_event_id, r.last_event_id,
         int(round(r.total_value * 100)))
        for r in count_window_slide(ev, size, slide).collect()
    )
    assert got_s == want_s, ("count_slide", data, size, slide,
                             got_s, want_s)


FAMILIES = [
    ("runagg_chain", fuzz_runagg_chain),
    ("iterative", fuzz_iterative),
    ("until", fuzz_until),
    ("consecutive", fuzz_consecutive),
    ("relaxed_groups", fuzz_relaxed_groups),
    ("until_define", fuzz_until_define),
    # round 12 engines:
    ("followed_by_iterative", fuzz_followed_by_iterative),
    ("not_followed_by_end", fuzz_not_followed_by_end),
    # round 13 engines:
    ("mixed_links", fuzz_mixed_links),
    ("within_step", fuzz_within_step),
    ("readmit", fuzz_readmit),
    ("relaxed_skip", fuzz_relaxed_skip),
    # round 13: the r12 measure-composition layer as its own family
    ("all_rows_running", fuzz_all_rows_running),
    ("not_next_end", fuzz_not_next_end),
    ("not_next_quant", fuzz_not_next_quant),
    # round 14 engines / compositions:
    ("not_next_interior", fuzz_not_next_interior),
    ("within_step_links", fuzz_within_step_links),
    ("count_windows", fuzz_count_windows),
    # round 15 engines / compositions:
    ("nfb_interior", fuzz_nfb_interior),
    ("greedy", fuzz_greedy),
    ("times_combinations", fuzz_times_combinations),
    ("combinations_chain", fuzz_combinations_chain),
]


def main() -> int:
    per_family = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1101
    from flink_realtime_edu_demo_spark.session import get_spark

    spark = get_spark(app_name="fuzz-cep", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    total = 0
    for name, fn in FAMILIES:
        for c in range(per_family):
            # str seed: deterministic across processes (tuple/str
            # __hash__ is randomized by PYTHONHASHSEED)
            rng = random.Random(f"{seed}:{name}:{c}")
            try:
                fn(spark, rng)
            except AssertionError:
                print(f"MISMATCH family={name} corpus={c} seed={seed}")
                raise
            total += 1
        print(f"{name}: {per_family} corpora OK")
    print(f"fuzz_cep: {total} checks, 0 mismatches "
          f"(seed={seed}, {per_family}/family)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
