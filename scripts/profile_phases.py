#!/usr/bin/env python
"""Phase decomposition for bench entries (guide §1: measure first).

Splits each query's wall clock into (a) batch prep — artifact builds,
fixture writes, (b) streaming execution — run_to_memory /
run_foreach_batch, (c) the final drain collect the bench pays.  Works by
timing wrappers around the streaming harness entry points; everything
not inside them is "batch prep".

Usage: PYTHONPATH=/root/repo python scripts/profile_phases.py name [name...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROFILE_PASSES.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.session import get_spark
from flink_1_12_0_spark.streaming import core
from flink_1_12_0_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_events: list[tuple[str, float]] = []


def _wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        _events.append((name, time.perf_counter() - t0))
        return out

    setattr(mod, name, timed)
    return orig


def main() -> None:
    names = sys.argv[1:]
    passes = int(os.environ.get("PROFILE_PASSES", "2"))
    registry.load_all()
    spark = get_spark("profile-phases")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    # warm-up like bench.py
    registry.QUERIES["tpch_q1"](spark, SF_DIR).collect()
    for t in load_tables(spark, SF_DIR).values():
        t.count()
    import tempfile
    d = tempfile.mkdtemp(prefix="sg_prof_warm_")
    spark.range(3).write.mode("overwrite").parquet(d)
    core.run_to_memory(
        spark.readStream.schema("id bigint").parquet(d).groupBy("id").count(),
        output_mode="update", timeout_s=120)

    for w in ("run_to_memory", "run_foreach_batch", "local_table"):
        _wrap(core, w)

    for name in names:
        fn = registry.QUERIES[name]
        for p in range(passes):
            _events.clear()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            rows = df.collect()
            t_collect = time.perf_counter() - t1
            total = time.perf_counter() - t0
            stream_s = sum(d for n, d in _events
                           if n in ("run_to_memory", "run_foreach_batch"))
            fixture_s = sum(d for n, d in _events if n == "local_table")
            prep = t_build - stream_s
            print(f"{name} pass{p}: total={total:.3f} prep={prep:.3f} "
                  f"(fixtures={fixture_s:.3f}) stream={stream_s:.3f} "
                  f"collect={t_collect:.3f} rows={len(rows)}")
            for n, dur in _events:
                print(f"    {n}: {dur:.3f}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
