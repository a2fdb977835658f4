"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship extraction pipeline: documents (sf0.001) →
                  deterministic HTML wrap → Arrow-UDF extraction →
                  per-lang run-stats aggregate (the reference's core
                  value: content → markdown + token counts + totals).
queries()       — one entry per implemented operator (SURVEY.md §2);
                  see web_scraper_spark/plans/queries.py.
oracle_sql()    — DuckDB-runnable ANSI oracles with matching column
                  names for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: wrap each document's
    text into a deterministic HTML page, run the full extraction
    pipeline (clean → text/markdown → token count), and aggregate
    run stats per language (A1 semantics, contxt/cli.py:243-251)."""
    from pyspark.sql import functions as F

    from web_scraper_spark.functions.udfs import extract_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>doc "), F.col("doc_id").cast("string"),
                F.lit("</title></head><body><main><h1>"), F.col("source"),
                F.lit("</h1><p>"), F.col("text"), F.lit("</p></main></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
        F.col("lang"),
    )
    ex = extract_pages(pages)
    return (
        ex.groupBy("lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("token_count").alias("total_tokens"),
            F.sum(F.length("text")).alias("total_text_chars"),
            F.sum(F.length("markdown")).alias("total_md_chars"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from web_scraper_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from web_scraper_spark.plans.queries import ORACLES

    return dict(ORACLES)
