#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.session import get_spark
from flink_1_12_0_spark.tables import load_tables

# Headline set: covers scan/agg, multi-way joins, subqueries, window fns,
# dedup and similarity tiers. Keep ~10-15 queries so a bench run stays fast.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q8",
    "tpch_q9",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q21",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("flink_1_12_0_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    names = [n for n in HEADLINE if n in registry.QUERIES]
    # extend with any registered bench-tagged queries
    names += [n for n in registry.BENCH_EXTRA if n in registry.QUERIES and n not in names]

    # warm-up: JVM + parquet footer caches for EVERY base table (not
    # timed) — otherwise the first query to touch documents/embeddings
    # gets billed several seconds of one-time footer/codegen cost and
    # per-query numbers stop being comparable across rounds
    registry.QUERIES["tpch_q1"](spark, sf_dir).collect()
    for t in load_tables(spark, sf_dir).values():
        t.count()
    # streaming-engine warm-up: state-store provider + file-stream source
    # init are one-time session costs that would otherwise be billed to
    # whichever streaming query runs first (not timed)
    if any(n.startswith("stream_") for n in registry.BENCH_EXTRA):
        import tempfile

        from flink_1_12_0_spark.streaming.core import run_to_memory

        d = tempfile.mkdtemp(prefix="sg_bench_warm_")
        spark.range(3).write.mode("overwrite").parquet(d)
        warm = (
            spark.readStream.schema("id bigint").parquet(d)
            .groupBy("id").count()
        )
        run_to_memory(warm, output_mode="update", timeout_s=120)

    # three full passes, min per query: steady-state timing. A single
    # pass is hostage to GC pauses and state-store init landing on
    # whichever query runs next (observed 3x swings run-to-run), and on a
    # shared host whole passes can land on a noisy-neighbor window
    # (observed uniform ~1.6x inflation across back-to-back full runs) —
    # min-of-3 keeps per-query numbers comparable round-over-round.
    times: dict[str, float] = {}
    for _pass in range(3):
        for name in names:
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            df.collect()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
