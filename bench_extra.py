#!/usr/bin/env python
"""Round-7 optimization micro-bench (guide §1.4): time individual gate
queries with the noop sink so the computation is measured, not the
sink, with per-query min over N passes (box CPU drift mitigation —
see BENCH/BASELINE.md protocol note). bench.py itself is FROZEN for
driver measurement; numbers cited in OPTIMIZATION_r07.md come from
here.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q83_bm25_topk [q85_... ...]
  BENCH_EXTRA_PASSES=3 python bench_extra.py q77_duplicate_span_ranges
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    n_passes = int(os.environ.get("BENCH_EXTRA_PASSES", 3))

    from web_scraper_spark.plans.queries import QUERIES
    from web_scraper_spark.session import get_spark

    spark = get_spark("bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM codegen + python workers
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    best: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for p in range(n_passes):
        order = names if p % 2 == 0 else list(reversed(names))
        for name in order:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            samples[name].append(dt)
            if dt < best.get(name, float("inf")):
                best[name] = dt
            print(f"# pass {p} {name}: {dt:.2f}s", file=sys.stderr)
            spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "min": best, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
