"""Run every registered query vs its DuckDB oracle at sf0.01 — a local
pre-flight of the driver's correctness gate (same scale, strict canon)."""
import json
import os
import sys
import time
import traceback

import duckdb

from flink_1_12_0_spark import registry
from flink_1_12_0_spark.session import get_spark
from tests.utils import assert_matches_oracle

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    only = sys.argv[1:] or None
    registry.load_all()
    spark = get_spark()
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    results = {}
    names = only or list(registry.ordered_queries())
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in registry.ORACLES:
                assert_matches_oracle(df, duck, registry.ORACLES[name], name)
                status = "ok"
            else:
                df.count()
                status = "rows-only"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {e}"
            traceback.print_exc()
        dt = time.time() - t0
        results[name] = (status, round(dt, 2))
        print(f"{name:45s} {status:10s} {dt:6.2f}s", flush=True)
    bad = {k: v for k, v in results.items() if v[0].startswith("FAIL")}
    print(json.dumps({"total": len(results), "failed": len(bad), "bad": list(bad)}))


if __name__ == "__main__":
    main()
