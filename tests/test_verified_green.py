"""Staleness guard for the _VERIFIED_GREEN rotation (ADVICE round 2):
every key listed as already-driver-verified must still have the exact
query body the driver verified — otherwise a modified query rotated to
the back of queries() could dodge re-verification indefinitely.

On failure: either rotate the changed key out of _VERIFIED_GREEN in
__spark_entry__.py (so the driver re-checks it next round), or — only
right after a driver round confirmed it green — regenerate the recorded
hashes with tools/gen_green_hashes.py.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_verified_green_keys_exist_and_are_unchanged():
    m = _entry()
    from tools.gen_green_hashes import green_hashes

    with open(os.path.join(REPO, "tools", "green_hashes.json")) as f:
        recorded = json.load(f)
    current = green_hashes()
    missing = [k for k in m._VERIFIED_GREEN if k not in current]
    assert not missing, f"_VERIFIED_GREEN keys not in QUERIES: {missing}"
    unrecorded = sorted(set(current) - set(recorded))
    assert not unrecorded, (
        f"no recorded verified hash for {unrecorded} — a key was added to "
        "_VERIFIED_GREEN without running tools/gen_green_hashes.py after "
        "its driver verdict"
    )
    stale = sorted(k for k, h in current.items() if recorded.get(k) != h)
    assert not stale, (
        f"query body changed since its recorded driver verdict: {stale} — "
        "rotate these out of _VERIFIED_GREEN for re-verification"
    )


def test_verified_green_is_subset_of_registry():
    m = _entry()
    qs = m.queries()
    # every registered query appears exactly once in the rotated ordering
    from flink_realtime_edu_demo_spark.registry import QUERIES

    assert list(sorted(qs)) == sorted(QUERIES)
    assert len(qs) == len(QUERIES)
    # the sacrificial warm-up key leads the driver's run order
    assert next(iter(qs)) == "q_warmup"
