#!/usr/bin/env python3
"""Record the text hash of every driver-graded query (fold-in step of the
grading rotation).

Run this EXACTLY when a round's grades are folded into a GRADED_ROUND_N
set in registry.py — it snapshots each graded-and-not-superseded query's
defining text (oracle SQL + Spark-side source) into
tests/graded_text_hashes.json.  From then on,
tests/test_registry_oracle.py::test_graded_text_unchanged fails whenever
a graded query's text changes without its name being moved into
SUPERSEDED_GREENS (and hence into the next grading window) — the
rewrite-without-regrade failure mode that created 27 stale greens in
round 6 (VERDICT r6 "What's wrong" #3).

Scope: the hash covers the query's own text only.  Edits to shared
operator libraries under graded greens are out of reach of any text
hash and are instead gated by the full-registry sf0.01 sweep
(scripts/sweep_sf001.py) required green at every snapshot SHA.

Usage:  PYTHONPATH=/root/repo python3 scripts/record_text_hashes.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

from flink_1_12_0_spark import registry

OUT = os.path.join(os.path.dirname(__file__), "..", "tests",
                   "graded_text_hashes.json")


def query_text(name: str) -> str:
    """The graded artifact's defining text: oracle SQL plus the Spark-side
    definition (the SQL string for register_sql queries — their closure
    source is shared boilerplate — else the function source)."""
    fn = registry.QUERIES[name]
    if fn.__qualname__.endswith("register_sql.<locals>._fn"):
        spark_side = fn.__defaults__[0]
    else:
        try:
            spark_side = inspect.getsource(fn)
        except (OSError, TypeError):
            spark_side = f"<unsourcable:{fn.__module__}.{fn.__qualname__}>"
    return registry.ORACLES.get(name, "") + "\x00" + spark_side


def current_hashes() -> dict[str, str]:
    registry.load_all()
    graded = (
        registry.GRADED_ROUNDS_1_2 | registry.GRADED_ROUND_3
        | registry.GRADED_ROUND_4 | registry.GRADED_ROUND_5_6
        | registry.GRADED_ROUND_8 | registry.GRADED_ROUND_9
        | registry.GRADED_ROUND_10 | registry.GRADED_ROUND_11
        | registry.GRADED_ROUND_12 | registry.GRADED_ROUND_13
        | registry.GRADED_ROUND_14 | registry.GRADED_ROUND_15
    ) - registry.SUPERSEDED_GREENS
    return {
        name: hashlib.sha256(query_text(name).encode()).hexdigest()[:16]
        for name in sorted(graded)
        if name in registry.QUERIES
    }


if __name__ == "__main__":
    hashes = current_hashes()
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(hashes)} graded-query text hashes -> {OUT}")
