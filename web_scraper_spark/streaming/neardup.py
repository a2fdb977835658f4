"""Incremental streaming NEAR-dup detection (MinHash-LSH over
micro-batches).

Exact streaming content dedup is a state-key lookup
(stateful.stream_content_dedup); NEAR-dup needs a candidate JOIN
against everything seen so far, which engine-managed per-key state
cannot express (a new doc must meet prior docs in any shared band
bucket, then verify across buckets). The streaming-native shape is a
``foreachBatch`` incremental index:

- a persistent SIGNATURE STORE under ``store_dir`` holds one parquet
  directory per micro-batch: (id, band, bucket, sig) rows — banded
  MinHash keys plus the full signature;
- each batch computes its own banded signatures JVM-side
  (operators.dedup.minhash_signature — no shuffle), joins them against
  the store ∪ itself on (band, bucket) — the same
  bounded-by-collision-probability join as the batch LSH operator —
  and VERIFIES candidates with the MinHash jaccard estimate
  (fraction of agreeing signature components; no text retained);
- outputs and store writes land in ``batch=<epoch_id>`` directories,
  so a replayed micro-batch OVERWRITES its own output instead of
  duplicating it — exactly-once under restart without a transaction
  log.

Scale notes: the store is banded keys + signatures only (≈ 100 bytes
per doc per band at 16 hashes) — no document text; the per-batch join
shuffles on (band, bucket); store reads prune to the banded-key
columns. Compact the store periodically (coalesce batch dirs) the
same way the crawl's seen-table compaction works.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_signature

_STORE_GLOB = "batch=*"


def _banded_sigs(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes)
    with_sig = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    return with_sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")


def make_near_dup_batch_fn(
    store_dir: str,
    pairs_dir: str,
    text_col: str = "text",
    id_col: str = "url",
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
):
    """Build the ``foreachBatch`` function: each micro-batch emits
    (id_a, id_b, est_jaccard) pairs — candidates via banded-key join
    against the store AND within the batch, verified by the MinHash
    estimate (agreeing components / num_hashes ≥ threshold) — then
    adds its own signatures to the store. Wire with
    ``writeStream.foreachBatch(fn)``."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new = _banded_sigs(batch_df, text_col, id_col, num_hashes, bands).persist()
        new.count()  # materialize once: store lookup + join both consume it

        have_store = any(
            e.startswith("batch=") for e in (os.listdir(store_dir) if os.path.isdir(store_dir) else [])
        )
        if have_store:
            old = spark.read.parquet(os.path.join(store_dir, _STORE_GLOB))
            # replay safety: a restarted batch must not see its own
            # previous (overwritten-in-flight) rows as "prior" docs
            corpus = old.unionByName(new)
        else:
            corpus = new
        a = new.alias("a")
        b = corpus.alias("b")
        est = (
            F.aggregate(
                F.zip_with(
                    F.col("a.sig"), F.col("b.sig"),
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(num_hashes)
        )
        # normalize with least/greatest, NOT a.id < b.id: the new doc's
        # id can sort either side of a stored doc's, and the probe side
        # is always `new` — an order filter would silently drop pairs
        # where the newcomer has the larger id
        pairs = (
            a.join(b, on=["band", "bucket"])
            .filter(F.col("a.id") != F.col("b.id"))
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                F.round(est, 6).alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= threshold)
            .distinct()
        )
        # batch=<epoch> targets make replays idempotent: a retried
        # epoch overwrites its own directories, never appends twice
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={epoch_id}")
        )
        new.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={epoch_id}")
        )
        new.unpersist()

    return process


def read_near_dup_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All pairs emitted so far (union of the per-batch outputs)."""
    return spark.read.parquet(os.path.join(pairs_dir, _STORE_GLOB))
