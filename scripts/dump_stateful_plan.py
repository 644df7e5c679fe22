#!/usr/bin/env python
"""Dump the STREAMING plans of the event-window/stateful operators the
r18 round touched — the FlatMapGroupsInPandasWithState grouping key is
the receipt (per-user before, per-_shard after).

Usage:
  PYTHONPATH=<tree> python <tree>/scripts/dump_stateful_plan.py <suffix> <outdir>
(run once with the r17 tree for *_before.txt, once with the r18 tree
for *_after.txt)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

SUFFIX = sys.argv[1]
OUTDIR = sys.argv[2]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from flink_1_12_0_spark.session import get_spark
    from flink_1_12_0_spark.streaming.core import events_stream
    from flink_1_12_0_spark.streaming.stateful import (
        session_event_windows, temporal_sort_stream, tumble_event_windows)

    spark = get_spark("dump-stateful-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUTDIR, exist_ok=True)
    ev = events_stream(spark, SF_DIR).where("event_type = 'purchase'")

    ops = {
        "stream_continuous_fire_op": tumble_event_windows(
            ev, ["user_id"], "ts", "event_id", "amount", 600,
            fire_interval_s=200),
        "stream_session_trigger_windows_op": session_event_windows(
            ev, ["user_id"], "ts", "event_id", "amount", 300),
        "stream_temporal_sort_op": temporal_sort_stream(
            ev, ["user_id"], "ts", "event_id", "amount"),
    }
    for name, sdf in ops.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            sdf.explain("formatted")
        path = os.path.join(OUTDIR, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
