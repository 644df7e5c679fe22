#!/usr/bin/env python
"""Driver-conditions A/B of streaming_first_seen_flag's shard default on
the full stream_lsh_dedup row (VERDICT r17 "Next round" #1).

One invocation = ONE arm in ONE fresh session (fresh JVM, bench.py's
warm-up, min-of-3 of the full row timed exactly like bench.py times it:
build + collect).  The caller interleaves arms across processes:

    for i in 1 2 3; do
        python scripts/ab_lsh_shards.py 1024 extra_row...
        python scripts/ab_lsh_shards.py default extra_row...
    done

Arms: "1024" forces the pre-r17 fixed shard count by wrapping
streaming_first_seen_flag; "default" leaves the parallelism-derived
default (max(64, 8 x defaultParallelism) = 256 on local[32]).
Any extra argv names are additional bench entries timed UNMODIFIED in
the same session (the untouched stateful siblings
stream_session_trigger_windows / stream_temporal_sort ride along to
check whether their r17 regression was window noise).

Prints one JSON line: {"arm": ..., "times": {name: min_sec}, "q6": sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.session import get_spark
from flink_1_12_0_spark.streaming import stateful
from flink_1_12_0_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    arm = sys.argv[1]
    extra = sys.argv[2:]
    if arm == "1024":
        orig = stateful.streaming_first_seen_flag

        def forced(sdf, bucket_keys, id_col, shards=None, **kw):
            return orig(sdf, bucket_keys, id_col,
                        shards=1024 if shards is None else shards, **kw)

        stateful.streaming_first_seen_flag = forced
        # the query imports the name from the module at call time
    elif arm != "default":
        raise SystemExit(f"unknown arm {arm!r}")

    registry.load_all()
    spark = get_spark("ab-lsh-shards")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    # bench.py warm-up, verbatim
    registry.QUERIES["tpch_q1"](spark, SF_DIR).collect()
    for t in load_tables(spark, SF_DIR).values():
        t.count()
    import tempfile

    from flink_1_12_0_spark.streaming.core import run_to_memory
    d = tempfile.mkdtemp(prefix="sg_ab_warm_")
    spark.range(3).write.mode("overwrite").parquet(d)
    run_to_memory(
        spark.readStream.schema("id bigint").parquet(d).groupBy("id").count(),
        output_mode="update", timeout_s=120)

    names = ["stream_lsh_dedup"] + extra
    times: dict[str, float] = {}
    for _p in range(3):
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{arm}:{name}")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    # q6 canary for the window-noise rule
    t0 = time.perf_counter()
    registry.QUERIES["tpch_q6"](spark, SF_DIR).collect()
    q6 = round(time.perf_counter() - t0, 3)
    print(json.dumps({"arm": arm, "times": times, "q6": q6}))


if __name__ == "__main__":
    main()
