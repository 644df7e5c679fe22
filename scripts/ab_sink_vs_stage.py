#!/usr/bin/env python
"""Crossover receipt for the r17 memory-sink -> parquet-stage drain swap
(VERDICT r17 "Next round" #9): drain an availableNow passthrough stream
of N rows through run_to_memory and run_to_stage, interleaved min-of-3,
across drain sizes — where does the stage's fixed write/read setup stop
dominating and the driver-collect cost take over?

The drained frame is consumed the way the bench consumes query results
(a .collect() of every row), so the timing includes each harness's
read-back cost, not just the drain.

Usage: PYTHONPATH=/root/repo python scripts/ab_sink_vs_stage.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [1_000, 10_000, 50_000, 100_000, 300_000]
PASSES = int(os.environ.get("AB_PASSES", "3"))


def main() -> None:
    from flink_1_12_0_spark.session import get_spark
    from flink_1_12_0_spark.streaming.core import run_to_memory, run_to_stage

    spark = get_spark("ab-sink-vs-stage")
    spark.sparkContext.setLogLevel("ERROR")
    # streaming-engine warm-up (state-store provider + file source init)
    d = tempfile.mkdtemp(prefix="sg_svs_warm_")
    spark.range(3).write.mode("overwrite").parquet(d)
    run_to_memory(
        spark.readStream.schema("id bigint").parquet(d).groupBy("id").count(),
        output_mode="update", timeout_s=120)

    table = {}
    for n in SIZES:
        src = tempfile.mkdtemp(prefix=f"sg_svs_{n}_")
        # three columns so the drain carries a realistic routed-row width
        spark.range(n).selectExpr(
            "id", "CAST(id % 64 AS INT) AS query_id",
            "id * 1000 AS score_e6").write.mode("overwrite").parquet(src)
        sdf = spark.readStream.schema(
            "id bigint, query_id int, score_e6 bigint").parquet(src)
        t_mem = t_stage = 9e9
        for _ in range(PASSES):
            spark.sparkContext.setJobDescription(f"svs-mem:{n}")
            t0 = time.perf_counter()
            run_to_memory(sdf, output_mode="append").collect()
            t_mem = min(t_mem, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"svs-stage:{n}")
            t0 = time.perf_counter()
            run_to_stage(sdf, output_mode="append").collect()
            t_stage = min(t_stage, time.perf_counter() - t0)
        table[n] = {"memory_sink": round(t_mem, 3),
                    "parquet_stage": round(t_stage, 3),
                    "stage_over_mem": round(t_stage / t_mem, 3)}
        print(n, table[n])
    print(json.dumps(table))


if __name__ == "__main__":
    main()
