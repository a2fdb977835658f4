"""SURVEY §5.2 resilience classes: dedup stability under permutation
(§5.2-4) and mid-round crash replay (§5.2-5: a round without _COMMIT
is replayed identically from the previous committed state)."""

import os
import shutil

from pyspark.sql import functions as F

from web_scraper_spark.crawl.rounds import CrawlConfig, last_committed_round, run_crawl
from web_scraper_spark.operators.dedup import exact_dedup
from web_scraper_spark.operators.relational import first_seen_dedup
from web_scraper_spark.sources.pages import pages_df, url_for


def test_first_seen_dedup_stable_under_permutation(spark):
    rows = [(i, f"text-{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "id int, text string")
    a = first_seen_dedup(df, ["text"], [F.col("id")]).select("id", "text")
    b = first_seen_dedup(
        df.orderBy(F.desc("id")).repartition(17), ["text"], [F.col("id")]
    ).select("id", "text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # winner is always the minimum id of each text group
    winners = {r["text"]: r["id"] for r in a.collect()}
    assert all(winners[f"text-{k}"] == k for k in range(7))


def test_exact_dedup_keeps_min_id_any_partitioning(spark):
    rows = [(i, "same doc  text") for i in range(50)] + [(99, "other")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = exact_dedup(df.repartition(13), "text", "doc_id")
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [0, 99]


def test_mid_round_crash_replays_identically(spark, tmp_path):
    n = 48
    pages = pages_df(spark, n)
    seeds = [url_for(r) for r in range(12)]

    ck_a = str(tmp_path / "a")
    cfg_a = CrawlConfig(ckpt_dir=ck_a, quota_per_host=16, max_depth=2, n_shards=4)
    run_crawl(spark, cfg_a, pages, None, seeds, n_rounds=2)

    # crash simulation: run rounds 0-1, then destroy round 1's commit
    # marker and half its outputs (a mid-round crash leaves partial,
    # uncommitted files) and resume
    ck_b = str(tmp_path / "b")
    cfg_b = CrawlConfig(ckpt_dir=ck_b, quota_per_host=16, max_depth=2, n_shards=4)
    run_crawl(spark, cfg_b, pages, None, seeds, n_rounds=2)
    r1 = os.path.join(ck_b, "round=1")
    os.remove(os.path.join(r1, "_COMMIT"))
    shutil.rmtree(os.path.join(r1, "frontier"))
    shutil.rmtree(os.path.join(r1, "seen"))
    assert last_committed_round(cfg_b) == 0
    run_crawl(spark, cfg_b, pages, None, None, n_rounds=1, resume=True)
    assert last_committed_round(cfg_b) == 1

    for sub in ("fetch_log", "results", "seen"):
        a = spark.read.parquet(os.path.join(ck_a, "round=1", sub))
        b = spark.read.parquet(os.path.join(ck_b, "round=1", sub))
        cols = sorted(set(a.columns) - {"scheduled_offset_ms"})  # compare full rows
        assert sorted(map(tuple, a.select(*sorted(a.columns)).collect())) == sorted(
            map(tuple, b.select(*sorted(b.columns)).collect())
        ), sub
