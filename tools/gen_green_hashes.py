"""Regenerate tools/green_hashes.json — the recorded source hash of every
query key in ``__spark_entry__._VERIFIED_GREEN``.

Run this ONLY right after refreshing _VERIFIED_GREEN from a driver round's
CORRECTNESS_r{N}.json, so each recorded hash corresponds to the exact query
body the driver verified. tests/test_verified_green.py then fails if a
listed query's body changes without being rotated out for re-verification
(the ADVICE round-2 staleness gap: a modified query rotated to the back
could dodge the driver's 50-key window forever).

Known limitation (documented, deliberate): the hash covers the query
function's own source (decorator + oracle SQL + body), not the operators it
calls — when an operator under ``operators/`` changes semantics, rotate its
dependent keys out of _VERIFIED_GREEN by hand, as done for q_join_asof /
q_llm_knn_ivf in round 3.
"""

from __future__ import annotations

import hashlib
import importlib.util
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def green_hashes() -> dict[str, str]:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from flink_realtime_edu_demo_spark.registry import QUERIES

    return {
        k: hashlib.sha256(inspect.getsource(QUERIES[k]).encode()).hexdigest()[:16]
        for k in m._VERIFIED_GREEN
        if k in QUERIES
    }


if __name__ == "__main__":
    out = os.path.join(REPO, "tools", "green_hashes.json")
    with open(out, "w") as f:
        json.dump(green_hashes(), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}")
