#!/usr/bin/env python
"""Time named bench entries in ONE fresh session, bench.py-style
(warm-up, min-of-3 build+collect), print one JSON line with a q6 canary.
Generic fresh-session arm runner for interleaved A/Bs where the two arms
are different CODE TREES (point PYTHONPATH at the tree to time).

Usage: PYTHONPATH=<tree> python <tree>/scripts/time_rows.py name [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.session import get_spark
from flink_1_12_0_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    registry.load_all()
    spark = get_spark("time-rows")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    registry.QUERIES["tpch_q1"](spark, SF_DIR).collect()
    for t in load_tables(spark, SF_DIR).values():
        t.count()
    import tempfile

    from flink_1_12_0_spark.streaming.core import run_to_memory
    d = tempfile.mkdtemp(prefix="sg_tr_warm_")
    spark.range(3).write.mode("overwrite").parquet(d)
    run_to_memory(
        spark.readStream.schema("id bigint").parquet(d).groupBy("id").count(),
        output_mode="update", timeout_s=120)

    times: dict[str, float] = {}
    for _p in range(3):
        for name in names:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    t0 = time.perf_counter()
    registry.QUERIES["tpch_q6"](spark, SF_DIR).collect()
    print(json.dumps({"tree": os.environ.get("PYTHONPATH", "?"),
                      "times": times,
                      "q6": round(time.perf_counter() - t0, 3)}))


if __name__ == "__main__":
    main()
