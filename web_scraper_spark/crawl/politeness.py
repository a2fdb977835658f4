"""Per-host politeness scheduler.

The reference is strictly sequential — at most one in-flight request,
implicit politeness (contxt/cli.py:276 loop; Selenium wait budgets
5/15 s, contxt/scraper.py:106-124). At cluster scale politeness must be
explicit: per-host crawl-delay budgets (robots), per-round quotas, and
deterministic ordering independent of parallelism.

Structure (SURVEY.md §4.2):
1. **Two-stage skew-guarded quota trim** — a hot host would funnel its
   millions of frontier rows into one ``applyInPandas`` group. Before
   grouping, trim per (host, salt) with ``row_number() <= quota`` and
   then per host — two cheap window passes whose first stage spreads
   the hot host over ``n_salts`` partitions. After this, every
   politeness group holds ≤ quota rows regardless of skew.
2. **Stateful grouped-map scheduler** — ``groupBy(host).applyInPandas``
   over (candidates ∪ host-state rows): orders by (priority, seq),
   enforces crawl_delay spacing from the host's ``next_allowed_ms``
   carried over from the previous round, emits ``scheduled_offset_ms``
   and the updated host state.

Ordering key contract (parity with the sequential reference): within a
host, rows are scheduled in (priority, seq) order — seq is the seed /
discovery sequence — which equals the reference's processing order
restricted to that host (SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("crawl_delay_ms", T.LongType(), True),
        T.StructField("scheduled_offset_ms", T.LongType(), True),
    ]
)

HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("next_allowed_ms", T.LongType(), False),
    ]
)


def quota_trim(
    candidates: DataFrame,
    quota_per_host: int,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage per-host top-``quota`` by (priority, seq); the first
    stage shards the hot host across ``n_salts`` window partitions so
    no single task sorts the whole hot host."""
    order = [F.asc("priority"), F.asc("seq")]
    salt = F.pmod(F.xxhash64("url"), F.lit(n_salts))
    stage1 = (
        candidates.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(Window.partitionBy("host", "_salt").orderBy(*order)))
        .filter(F.col("_rn1") <= quota_per_host)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        stage1.withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= quota_per_host)
        .drop("_rn2")
    )


def schedule_round(
    candidates: DataFrame,
    host_state: DataFrame | None,
    quota_per_host: int = 64,
    default_delay_ms: int = 1000,
    round_budget_ms: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Politeness scheduling for one crawl round.

    candidates: url, host, depth, priority, seq, crawl_delay_ms
    host_state: host, next_allowed_ms (carry-over; None for round 0)

    Returns (schedule, new_host_state). ``schedule`` rows carry
    ``scheduled_offset_ms`` — the virtual time offset within the round
    at which the fetch may start. Rows beyond the round budget are
    dropped from the schedule (they stay pending in the frontier and
    return next round).
    """
    spark = candidates.sparkSession
    trimmed = quota_trim(candidates, quota_per_host)

    if host_state is None:
        host_state = spark.createDataFrame([], HOST_STATE_SCHEMA)

    joined = trimmed.join(F.broadcast(host_state), "host", "left")

    budget = round_budget_ms

    def run(key, pdf):  # no hints: future-annotations stringifies them and pandas group-ops warns
        # Vectorized virtual-clock assignment: offset[i] = start +
        # cumsum(delays)[i-1]. A hot host funnels its whole round quota
        # into this one group, so the group body must be O(n) numpy,
        # never per-row Python.
        host = key[0]
        pdf = pdf.sort_values(["priority", "seq"], kind="mergesort").reset_index(drop=True)
        start = 0
        if pdf["next_allowed_ms"].notna().any():
            start = int(pdf["next_allowed_ms"].dropna().iloc[0])
        delays = pdf["crawl_delay_ms"].fillna(default_delay_ms).astype("int64")
        offsets = start + delays.cumsum().shift(1, fill_value=0)
        if budget is not None:
            keep = offsets <= budget
            pdf, delays, offsets = pdf[keep], delays[keep], offsets[keep]
        return pd.DataFrame(
            {
                "url": pdf["url"],
                "host": host,
                "depth": pdf["depth"].astype("Int32"),
                "priority": pdf["priority"].astype("float64"),
                "seq": pdf["seq"].astype("Int64"),
                "crawl_delay_ms": delays.astype("int64"),
                "scheduled_offset_ms": offsets.astype("int64"),
            },
            columns=[f.name for f in SCHEDULE_SCHEMA.fields],
        )

    schedule = joined.groupBy("host").applyInPandas(run, SCHEDULE_SCHEMA)

    # new host state: where the virtual clock ended per host, minus the
    # round budget (next round restarts its virtual clock at 0).
    agg = schedule.groupBy("host").agg(
        (F.max("scheduled_offset_ms") + F.max("crawl_delay_ms")).alias("end_ms")
    )
    if round_budget_ms is not None:
        carry = F.greatest(F.col("end_ms") - F.lit(round_budget_ms), F.lit(0))
    else:
        carry = F.lit(0)
    new_state = agg.select("host", carry.cast("long").alias("next_allowed_ms"))
    return schedule, new_state
