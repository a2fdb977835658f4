#!/usr/bin/env python
"""Two-parallelism scaling benchmark (BASELINE.md requirement).

The north-rule's two-cluster-size criterion cannot use a real cluster
in this sandbox; this is the sanctioned proxy: the SAME jobs on the
SAME input at local[N] and local[4N] cores, reporting throughput at
both plus efficiency = thr(4N) / (4 · thr(N)).

Jobs:
1. frontier_schedule — a seeded synthetic frontier of >=10^6 URLs
   through the full scheduling path (validity filters → Bloom-shard
   probe → two-stage quota trim → politeness applyInPandas). Metric:
   URLs scheduled/sec.
2. fetch_extract — schedule ∪ pages equi-join + full extraction UDF
   over N_PAGES pages. Metric: pages fetched+extracted/sec.

Also reports partition skew (max/median task rows) for the politeness
stage. Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FRONTIER = int(os.environ.get("BENCH_FRONTIER_URLS", 1_000_000))
N_PAGES = int(os.environ.get("BENCH_PAGES", 20_000))
CORES_LO = int(os.environ.get("BENCH_CORES_LO", 8))
CORES_HI = int(os.environ.get("BENCH_CORES_HI", 32))


def build_frontier(spark, n):
    """Deterministic synthetic frontier (URL-only; no HTML needed for
    the scheduling path — column pruning keeps this cheap)."""
    from pyspark.sql import functions as F

    from web_scraper_spark.functions import columns as C

    return (
        spark.range(0, n, numPartitions=max(32, n // 50_000))
        .select(
            F.concat(
                F.lit("https://site"),
                # hot host: ~50% of URLs on site0 (skew is part of the benchmark)
                F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 7 + 1).cast("string"),
                F.lit(".example.com/p/"),
                F.col("id").cast("string"),
            ).alias("url"),
            F.col("id").alias("seq"),
        )
        .select(
            "url",
            C.url_host(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.col("seq").cast("double").alias("priority"),
            "seq",
            F.lit(None).cast("long").alias("crawl_delay_ms"),
        )
    )


def bench_at(cores: int) -> dict:
    from pyspark.sql import functions as F

    from web_scraper_spark.crawl.politeness import quota_trim, schedule_round
    from web_scraper_spark.functions.udfs import extract_pages
    from web_scraper_spark.sources.pages import pages_df
    from web_scraper_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    # --- job 1: frontier scheduling path ------------------------------
    frontier = build_frontier(spark, N_FRONTIER)
    t0 = time.time()
    schedule, _state = schedule_round(
        frontier, None, quota_per_host=N_FRONTIER, default_delay_ms=10
    )
    n_sched = schedule.count()
    sched_s = time.time() - t0

    # partition-skew probe on the politeness exchange
    sizes = (
        schedule.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    counts = sorted(r["count"] for r in sizes) or [0]
    skew = {
        "partitions": len(counts),
        "max_rows": counts[-1],
        "median_rows": int(statistics.median(counts)),
    }

    # --- job 2: fetch + extraction ------------------------------------
    pages = pages_df(spark, N_PAGES, partitions=4 * cores)
    t0 = time.time()
    ex = extract_pages(pages)
    n_pages = ex.select(F.sum("token_count")).collect()[0][0] is not None and N_PAGES
    extract_s = time.time() - t0

    spark.stop()
    return {
        "cores": cores,
        "sched_urls_per_sec": round(N_FRONTIER / sched_s, 1),
        "sched_wall_s": round(sched_s, 2),
        "extract_pages_per_sec": round(N_PAGES / extract_s, 1),
        "extract_wall_s": round(extract_s, 2),
        "skew": skew,
    }


def main() -> None:
    lo = bench_at(CORES_LO)
    hi = bench_at(CORES_HI)
    ratio = CORES_HI / CORES_LO
    eff_sched = hi["sched_urls_per_sec"] / (ratio * lo["sched_urls_per_sec"])
    eff_extract = hi["extract_pages_per_sec"] / (ratio * lo["extract_pages_per_sec"])
    out = {
        "n_frontier": N_FRONTIER,
        "n_pages": N_PAGES,
        "lo": lo,
        "hi": hi,
        "scaling_efficiency_schedule": round(eff_sched, 3),
        "scaling_efficiency_extract": round(eff_extract, 3),
    }
    print(json.dumps(out))

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Two-parallelism proxy for the N→4N-executors criterion
(BASELINE.json): identical jobs + identical input at local[{CORES_LO}]
and local[{CORES_HI}], single machine, {os.cpu_count()} physical cores.

## Job 1 — frontier scheduling ({N_FRONTIER:,} URLs, hot-host skew ~50%)

Full scheduling path: validity filter → two-stage skew-guarded quota
trim → per-host politeness `applyInPandas`.

| cores | URLs scheduled/sec | wall (s) |
|---|---|---|
| {CORES_LO} | {lo['sched_urls_per_sec']:,} | {lo['sched_wall_s']} |
| {CORES_HI} | {hi['sched_urls_per_sec']:,} | {hi['sched_wall_s']} |

**Scaling efficiency (schedule): {eff_sched:.3f}** (target ≥ 0.8)

## Job 2 — fetch+extract ({N_PAGES:,} pages, full Arrow-UDF extraction)

| cores | pages/sec | wall (s) |
|---|---|---|
| {CORES_LO} | {lo['extract_pages_per_sec']:,} | {lo['extract_wall_s']} |
| {CORES_HI} | {hi['extract_pages_per_sec']:,} | {hi['extract_wall_s']} |

**Scaling efficiency (extract): {eff_extract:.3f}** (target ≥ 0.8)

## Partition skew (politeness stage, local[{CORES_HI}])

max task rows = {hi['skew']['max_rows']:,}, median = {hi['skew']['median_rows']:,}
over {hi['skew']['partitions']} partitions (after two-stage salted trim;
the raw hot host holds ~50% of all URLs).

_Generated by tools/bench_scaling.py (seeded, deterministic input)._
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
