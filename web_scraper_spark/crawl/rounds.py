"""Micro-batch crawl rounds with atomic checkpoints and resume.

One round (the Spark re-expression of the reference's sequential
per-URL loop, contxt/cli.py:276-307 — SURVEY.md §2.10):

    frontier(pending) ──filters──▶ candidates ──seen-sketch──▶ fresh
      ──politeness schedule──▶ scheduled ──J6 join pages──▶ fetched
      ──extract UDF──▶ results + discovered links ──▶ frontier′

State per round, checkpointed to ``<ckpt>/round=N/``:
    frontier/    next round's pending rows (parquet)
    seen/        exact seen URLs (parquet, appended each round)
    shards/      Bloom shard rows (parquet, OR-merged)
    host_state/  politeness virtual-clock carry-over
    results/     extracted rows for the round
    metrics/     per-partition lineage + counters
    _COMMIT      empty marker written LAST → the round is atomic:
                 a crash mid-round leaves no marker and resume replays
                 the round from the previous committed state.

Everything is plain parquet-dir checkpointing (the sandbox has no
Iceberg jars); the commit protocol gives the same atomic-visibility
property a real deployment would get from Iceberg snapshot commits.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import columns as C
from ..functions.udfs import extract_pages
from .frontier import (
    apply_url_blocklist,
    FRONTIER_SCHEMA,
    apply_url_filters,
    build_seen_shards,
    merge_shard_tables,
    probe_seen,
    seeds_to_frontier,
)
from .politeness import schedule_round


@dataclass
class CrawlConfig:
    ckpt_dir: str
    n_shards: int = 16
    quota_per_host: int = 256
    default_delay_ms: int = 1000
    round_budget_ms: int | None = None
    max_depth: int = 2
    ignore_patterns: list[str] = field(default_factory=list)
    # drop pathological (trap-shaped) URLs at discovery time
    # (functions/columns.py:is_crawler_trap — path-depth / segment-loop
    # / query-explosion / length rules, same codegen stage as the
    # validity filter)
    trap_filter: bool = False
    expected_per_shard: int = 1 << 16
    fp_rate: float = 1e-4
    # URL-seen sketch family: "bloom" (default, fewest bits/item) or
    # "cuckoo" (deletable — a crawl that will serve recrawl scheduling
    # must pick cuckoo so forget_seen_urls can reopen stale URLs).
    # Persisted shards are self-describing; resume keeps whichever
    # family built the checkpoint.
    sketch_kind: str = "bloom"
    # AIMD adaptive per-host crawl delay (politeness.py:
    # update_host_delays): hosts with fetch errors back off
    # multiplicatively, healthy hosts recover additively toward the
    # min. Fills in ONLY where robots declares no Crawl-delay. State
    # rides the round checkpoint (round=N/host_delay) — resumable like
    # every other table.
    adaptive_delay: bool = False
    adaptive_min_delay_ms: int = 250
    adaptive_max_delay_ms: int = 60_000
    # state tables are small relative to results; coalesce their writes
    # to avoid 1-row-per-task file storms (None = leave partitioning to
    # AQE — the right setting on a real cluster with large rounds)
    state_write_partitions: int | None = 8
    # count the next frontier for stats (costs one extra job per
    # round; loop control only needs the scheduled count)
    collect_frontier_count: bool = True
    # which extraction products the results sink persists per round
    # (links for discovery and the metrics counters are always
    # produced). Markdown is the dominant results write — a crawl that
    # only needs text (or only counts) trims the round's write volume
    # here without touching the extraction contract.
    results_products: tuple = ("title", "text", "markdown", "token_count", "n_images")
    # compact the append-only seen table every K rounds (between
    # compactions each round appends only its own scheduled URLs —
    # O(round) not O(total) write cost; the Iceberg-append analog)
    seen_compact_every: int = 8
    # LSM-style size trigger: ALSO compact when the bytes appended
    # since the last compaction exceed this fraction of the compacted
    # base (None = round-count only). Driver-side file-metadata check,
    # no Spark job — at real scale this is an Iceberg snapshot-size
    # policy. Amortizes the O(total) compaction cost against growth
    # instead of a fixed clock.
    seen_compact_ratio: float | None = None
    # host-authority frontier priority (north star's cross-host
    # priority queue): every K rounds run integer PageRank over the
    # accumulated discovered-link HOST graph (host-level — orders of
    # magnitude smaller than the frontier) and order the next rounds'
    # global schedule cap by the resulting rank. None = off (per-host
    # quotas only, no cross-host preference).
    authority_every: int | None = None
    authority_iterations: int = 2
    # global top-K rows per round across all hosts, selected by
    # (host_rank desc, priority, seq) — the lever that makes authority
    # bite. None = every host schedules up to its quota.
    max_scheduled_per_round: int | None = None


def _round_dir(cfg: CrawlConfig, round_id: int) -> str:
    return os.path.join(cfg.ckpt_dir, f"round={round_id}")


def last_committed_round(cfg: CrawlConfig) -> int | None:
    """Highest round with a _COMMIT marker, or None."""
    best = None
    if not os.path.isdir(cfg.ckpt_dir):
        return None
    for name in os.listdir(cfg.ckpt_dir):
        if name.startswith("round="):
            rid = int(name.split("=", 1)[1])
            if os.path.exists(os.path.join(cfg.ckpt_dir, name, "_COMMIT")):
                best = rid if best is None or rid > best else best
    return best


def _write(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    if coalesce is not None:
        df = df.coalesce(coalesce)
    t0 = time.time()
    df.write.mode("overwrite").parquet(path)
    if os.environ.get("CRAWL_PHASE_DEBUG"):
        print(
            f"# crawl-write {os.path.basename(path)}: {time.time()-t0:.2f}s",
            file=sys.stderr,
        )


def _read(spark: SparkSession, path: str, schema=None) -> DataFrame | None:
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def _dir_bytes(path: str) -> int:
    total = 0
    if os.path.isdir(path):
        for name in os.listdir(path):
            fp = os.path.join(path, name)
            if os.path.isfile(fp):
                total += os.path.getsize(fp)
    return total


def seen_delta_exceeds_ratio(cfg: CrawlConfig, upto_round: int) -> bool:
    """LSM-style compaction trigger: appended seen bytes since the
    last compaction vs the compacted base size (file metadata only —
    no Spark job; the deployment analog is an Iceberg snapshot-size
    policy)."""
    if cfg.seen_compact_ratio is None:
        return False
    delta, base, rid = 0, 0, upto_round
    while rid >= 0:
        d = os.path.join(_round_dir(cfg, rid), "seen")
        if os.path.exists(os.path.join(_round_dir(cfg, rid), "_SEEN_COMPACT")):
            base = _dir_bytes(d)
            break
        delta += _dir_bytes(d)
        rid -= 1
    return base > 0 and delta >= cfg.seen_compact_ratio * base


def read_seen(spark: SparkSession, cfg: CrawlConfig, upto_round: int) -> DataFrame | None:
    """Union of the append-only per-round seen tables up to (and
    including) ``upto_round``. A compacted round's seen dir holds the
    full set, so reading starts at the latest compaction point."""
    dirs = []
    start = upto_round
    while start >= 0:
        d = os.path.join(_round_dir(cfg, start), "seen")
        if os.path.exists(os.path.join(_round_dir(cfg, start), "_SEEN_COMPACT")):
            dirs.append(d)
            break
        if os.path.isdir(d):
            dirs.append(d)
        start -= 1
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def read_host_edges(
    spark: SparkSession, cfg: CrawlConfig, upto_round: int
) -> DataFrame | None:
    """Union of per-round host-edge deltas up to ``upto_round`` —
    authority rounds write the cumulative distinct set + an
    ``_EDGES_COMPACT`` marker, so the walk stops there (same LSM shape
    as :func:`read_seen`)."""
    dirs = []
    rid = upto_round
    while rid >= 0:
        d = os.path.join(_round_dir(cfg, rid), "host_edges")
        if os.path.exists(os.path.join(_round_dir(cfg, rid), "_EDGES_COMPACT")):
            dirs.append(d)
            break
        if os.path.isdir(d):
            dirs.append(d)
        rid -= 1
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def read_host_rank(
    spark: SparkSession, cfg: CrawlConfig, upto_round: int
) -> DataFrame | None:
    """Latest committed (host, rank_micros) authority table at or
    before ``upto_round``, or None before the first authority round."""
    rid = upto_round
    while rid >= 0:
        d = os.path.join(_round_dir(cfg, rid), "host_rank")
        if os.path.isdir(d):
            return spark.read.parquet(d)
        rid -= 1
    return None


def run_round(
    spark: SparkSession,
    cfg: CrawlConfig,
    pages: DataFrame,
    robots: DataFrame | None,
    round_id: int,
    blocklist: DataFrame | None = None,
) -> dict:
    """Execute one crawl round from the state committed at
    ``round_id - 1`` and commit ``round=round_id``. Returns metrics.
    ``blocklist`` (a ``domain`` table, RefinedWeb's UT1 stage) drops
    blocked hosts and their subdomains ahead of the seen probe —
    apply_url_blocklist's broadcast suffix join."""
    t0 = time.time()
    prev = _round_dir(cfg, round_id - 1)
    frontier = _read(spark, os.path.join(prev, "frontier"))
    if frontier is None:
        raise RuntimeError(f"no committed frontier at {prev}")
    seen = read_seen(spark, cfg, round_id - 1)
    shards = _read(spark, os.path.join(prev, "shards"))
    host_state = _read(spark, os.path.join(prev, "host_state"))

    # -- filter chain (all JVM-side except the Bloom probe) -------------
    candidates = apply_url_filters(
        frontier.filter(F.col("status") == "pending").filter(F.col("depth") <= cfg.max_depth),
        robots=robots,
        ignore_patterns=cfg.ignore_patterns,
        trap_filter=cfg.trap_filter,
    )
    if blocklist is not None:
        candidates = apply_url_blocklist(candidates, blocklist)
    round_caches: list[DataFrame] = []
    fresh = probe_seen(
        candidates, shards, seen, cfg.n_shards,
        unpersist_into=round_caches, eager=True,
    )

    # -- politeness scheduling -----------------------------------------
    delay_col = (
        (F.col("crawl_delay") * 1000).cast("long")
        if robots is not None and "crawl_delay" in candidates.columns
        else F.lit(None).cast("long")
    )
    sched_in = fresh.select(
        "url", "host", "depth", "priority", "seq", delay_col.alias("crawl_delay_ms")
    )
    host_delays = (
        _read(spark, os.path.join(prev, "host_delay"))
        if cfg.adaptive_delay
        else None
    )
    if host_delays is not None:
        # robots-declared delay stays authoritative; the AIMD budget
        # fills in for the (vast majority of) hosts robots is silent
        # about. Host-level table — broadcast onto the candidates.
        sched_in = (
            sched_in.join(
                F.broadcast(host_delays.select("host", "delay_ms")), "host", "left"
            )
            .withColumn(
                "crawl_delay_ms",
                F.coalesce(F.col("crawl_delay_ms"), F.col("delay_ms")),
            )
            .drop("delay_ms")
        )
    host_rank = (
        read_host_rank(spark, cfg, round_id - 1)
        if cfg.authority_every is not None
        else None
    )
    schedule, new_host_state = schedule_round(
        sched_in,
        host_state,
        quota_per_host=cfg.quota_per_host,
        default_delay_ms=cfg.default_delay_ms,
        round_budget_ms=cfg.round_budget_ms,
        host_rank=host_rank,
        max_scheduled_per_round=cfg.max_scheduled_per_round,
    )
    schedule = schedule.persist()

    # -- fetch = J6 equi-join against the pages corpus ------------------
    fetched = schedule.join(
        pages.select("url", "html", F.col("warc_ts")), "url", "left"
    ).withColumn(
        "fetch_status", F.when(F.col("html").isNotNull(), "fetched").otherwise("failed")
    ).persist()

    # -- extraction (one Arrow round-trip) ------------------------------
    # The fetch join's output partitioning follows the join strategy
    # (broadcast → pages-side partitions; politeness output → ≤n_hosts
    # groups). Neither bounds extraction parallelism correctly, so
    # spread rows explicitly before the expensive UDF stage.
    # PRUNED products: only what this round's sinks consume crosses
    # Arrow — cfg.results_products for the results sink (token_count
    # always included for the metrics counters), links for discovery.
    # The carrier columns (clean_html, og_*, image structs) never
    # ship, and the pre-repartition select keeps the exchange payload
    # to the fetch columns the sinks actually read.
    # Repartitioning ON url (not round-robin): when the fetch join
    # already hash-exchanged on url (SMJ — uniform across tasks since
    # urls are distinct), Catalyst elides this exchange as redundant;
    # when the join broadcast instead (output inherits the schedule's
    # skewed by-host partitioning), it redistributes. Either way the
    # UDF stage is balanced without paying a second html shuffle.
    par = spark.sparkContext.defaultParallelism
    products = tuple(dict.fromkeys((*cfg.results_products, "token_count")))
    ok = (
        fetched.filter(F.col("fetch_status") == "fetched")
        .select("url", "host", "depth", "seq", "scheduled_offset_ms", "html")
        .repartition(par, "url")
    )
    extracted = extract_pages(
        ok,
        html_col="html",
        url_col="url",
        products=(*products, "links"),
    ).persist()

    rdir = _round_dir(cfg, round_id)
    # Round counters ride the write actions via df.observe() — the
    # fetch join is 1:1 (pages.url unique, left join), so the
    # fetch_log write counts the schedule, the results write counts
    # extraction, and the frontier write counts next-round pendings.
    # Zero dedicated count jobs per round (three jobs saved).
    from pyspark.sql import Observation

    obs_sched = Observation("n_sched")
    obs_ok = Observation("n_ok")
    # fetch_log: the politeness-ordered fetch ledger for the round —
    # the parity surface (per-host order) and the lineage record.
    fetch_log = fetched.select(
        "url", "host", "depth", "seq", "priority", "scheduled_offset_ms",
        "fetch_status", F.lit(round_id).alias("round_id"),
    ).observe(obs_sched, F.count(F.lit(1)).alias("n"))
    _write(fetch_log, os.path.join(rdir, "fetch_log"), cfg.state_write_partitions)

    if cfg.adaptive_delay:
        # AIMD politeness state: per-host ok/err counts from THIS
        # round's fetch ledger update the carry-over delay table
        # (politeness.py:update_host_delays). Host-level agg over the
        # already-persisted fetch output — one small host-keyed
        # shuffle, no extra scan of pages.
        from .politeness import update_host_delays

        host_stats = fetched.groupBy("host").agg(
            F.count(F.when(F.col("fetch_status") == "fetched", 1)).alias("n_ok"),
            F.count(F.when(F.col("fetch_status") != "fetched", 1)).alias("n_err"),
        )
        new_delays = update_host_delays(
            host_stats,
            host_delays,
            default_delay_ms=cfg.default_delay_ms,
            min_delay_ms=cfg.adaptive_min_delay_ms,
            max_delay_ms=cfg.adaptive_max_delay_ms,
        )
        _write(
            new_delays, os.path.join(rdir, "host_delay"), cfg.state_write_partitions
        )

    # -- results + metrics ---------------------------------------------
    results = extracted.select(
        "url", "host", "depth", "seq", "scheduled_offset_ms",
        *products,
        F.lit(round_id).alias("round_id"),
    ).observe(obs_ok, F.count(F.lit(1)).alias("n"))
    _write(results, os.path.join(rdir, "results"))

    # per-partition lineage + counters (S14/metrics table): which input
    # partition produced how many rows, and the round provenance.
    # md_bytes tracks the dominant write only when markdown is a
    # configured product (−1 = not produced this round).
    md_bytes = (
        F.sum(F.length("markdown"))
        if "markdown" in products
        else F.lit(-1).cast("long")
    )
    metrics = (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("token_count").alias("tokens"),
            md_bytes.alias("md_bytes"),
        )
        .withColumn("round_id", F.lit(round_id))
        .withColumn("src", F.lit("extracted"))
    )

    # The remaining state writes (metrics, seen, shards, host_state,
    # frontier, host-authority) are INDEPENDENT given the persisted
    # upstreams the fetch_log/results actions already materialized
    # (schedule, fetched, extracted, the probe caches), so they are
    # collected as deferred tasks and submitted from a small thread
    # pool: each write is a short job whose tail would otherwise
    # leave the executor idle — overlapping them back-fills the idle
    # cores (guide §2.6); FIFO scheduling keeps the earlier job's
    # tasks first. Measured ~2.5 s serial → ~1.2 s overlapped per
    # round at the bench shape. Marker files are written inside their
    # own task, strictly after that table's parquet commit; the
    # round's _COMMIT marker still lands only after every task has
    # joined.
    write_tasks: list = []

    write_tasks.append(
        lambda: _write(
            metrics, os.path.join(rdir, "metrics"), cfg.state_write_partitions
        )
    )

    # -- seen state update (append-only; periodic compaction) ------------
    scheduled_urls = schedule.select("url")
    compact = (
        cfg.seen_compact_every > 0
        and round_id % cfg.seen_compact_every == cfg.seen_compact_every - 1
    ) or seen_delta_exceeds_ratio(cfg, round_id - 1)

    def _write_seen():
        if compact and seen is not None:
            full = seen.select("url").unionByName(scheduled_urls).distinct()
            _write(full, os.path.join(rdir, "seen"), cfg.state_write_partitions)
            with open(os.path.join(rdir, "_SEEN_COMPACT"), "w") as fh:
                fh.write("")
        else:
            _write(
                scheduled_urls, os.path.join(rdir, "seen"),
                cfg.state_write_partitions,
            )
            if compact:  # round 0 of a compaction cycle with no prior seen
                with open(os.path.join(rdir, "_SEEN_COMPACT"), "w") as fh:
                    fh.write("")

    write_tasks.append(_write_seen)

    new_shards = build_seen_shards(
        scheduled_urls, cfg.n_shards, round_id, cfg.expected_per_shard, cfg.fp_rate,
        sketch_kind=cfg.sketch_kind,
    )
    all_shards = new_shards if shards is None else merge_shard_tables(shards.unionByName(new_shards))
    write_tasks.append(
        lambda: _write(
            all_shards, os.path.join(rdir, "shards"), cfg.state_write_partitions
        )
    )
    write_tasks.append(
        lambda: _write(
            new_host_state, os.path.join(rdir, "host_state"),
            cfg.state_write_partitions,
        )
    )

    # -- next frontier: deferred pendings + discovered links ------------
    # Only quota/budget overflow defers: rows dropped by the static
    # filters (validity, ignore patterns, robots, depth) can never
    # pass later and must NOT re-enter the frontier (at 10^10 URLs the
    # frontier would otherwise accrete permanent junk); seen rows are
    # gone by definition.
    scheduled_set = schedule.select("url")
    deferred = fresh.select([f.name for f in FRONTIER_SCHEMA.fields]).join(
        scheduled_set, "url", "left_anti"
    )
    # Discovery ordering must be a pure function of the data, never of
    # partitioning (SURVEY.md §7 hard-part 2): priority = (first
    # discovering parent's seq, link position in that document); seq =
    # stable hash of the url (unique tie-break, identical at any
    # parallelism and across resume).
    discovered_raw = extracted.select(
        F.col("seq").alias("parent_seq"),
        F.col("depth").alias("parent_depth"),
        F.posexplode("links").alias("pos", "url"),
    )
    first_discovery = discovered_raw.groupBy("url").agg(
        F.min(F.struct("parent_seq", "pos", "parent_depth")).alias("d")
    )
    discovered = (
        first_discovery.select(
            "url",
            C.url_host(F.col("url")).alias("host"),
            (F.col("d.parent_depth") + 1).cast("int").alias("depth"),
            (F.col("d.parent_seq").cast("double") * 10000.0 + F.col("d.pos")).alias("priority"),
            F.xxhash64("url").alias("seq"),
        )
        .withColumn("round_id", F.lit(round_id + 1))
        .withColumn("status", F.lit("pending"))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
        .join(
            scheduled_urls if seen is None else seen.select("url").unionByName(scheduled_urls),
            "url",
            "left_anti",
        )
        # a URL can be BOTH quota/budget-deferred this round and
        # rediscovered in this round's extracted links; without this
        # anti-join it would enter the next frontier twice (distinct
        # priority/seq) and be fetched twice. The deferred row wins —
        # it carries the earlier discovery's priority.
        .join(deferred.select("url"), "url", "left_anti")
    )
    next_frontier = deferred.select([f.name for f in FRONTIER_SCHEMA.fields]).unionByName(discovered)
    obs_next = Observation("n_next") if cfg.collect_frontier_count else None
    if obs_next is not None:
        next_frontier = next_frontier.observe(
            obs_next, F.count(F.lit(1)).alias("n")
        )
    write_tasks.append(
        lambda: _write(
            next_frontier, os.path.join(rdir, "frontier"),
            cfg.state_write_partitions,
        )
    )

    # -- host-authority state (optional; the cross-host priority queue)
    # Per round: one distinct over HOST-level link edges (tiny next to
    # the frontier). Every authority_every rounds: compact the edge
    # deltas (LSM, _EDGES_COMPACT marker) and refresh the integer-
    # PageRank table the NEXT rounds' schedule cap orders by. Rank is
    # computed from the just-written compacted parquet so the distinct
    # doesn't recompute once per PageRank iteration.
    if cfg.authority_every is not None:
        from ..operators.graph import integer_pagerank

        delta_edges = (
            extracted.select(F.col("host").alias("src"), F.explode("links").alias("l"))
            .select("src", C.url_host(F.col("l")).alias("dst"))
            .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
            .distinct()
        )
        edges_dir = os.path.join(rdir, "host_edges")

        def _write_authority():
            if round_id % cfg.authority_every == cfg.authority_every - 1:
                prior = read_host_edges(spark, cfg, round_id - 1)
                cum = (
                    delta_edges
                    if prior is None
                    else prior.unionByName(delta_edges).distinct()
                )
                _write(cum, edges_dir, cfg.state_write_partitions)
                with open(os.path.join(rdir, "_EDGES_COMPACT"), "w") as fh:
                    fh.write("")
                rank = integer_pagerank(
                    spark.read.parquet(edges_dir),
                    iterations=cfg.authority_iterations,
                )
                _write(
                    rank.select(F.col("node").alias("host"), "rank_micros"),
                    os.path.join(rdir, "host_rank"),
                    cfg.state_write_partitions,
                )
            else:
                _write(delta_edges, edges_dir, cfg.state_write_partitions)

        write_tasks.append(_write_authority)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        for fut in [pool.submit(t) for t in write_tasks]:
            fut.result()

    n_sched = int(obs_sched.get["n"])
    n_ok = int(obs_ok.get["n"])
    n_failed = n_sched - n_ok  # left join preserves every scheduled row
    n_next = int(obs_next.get["n"]) if obs_next is not None else -1
    schedule.unpersist()
    fetched.unpersist()
    extracted.unpersist()
    for cached in round_caches:
        cached.unpersist()

    # atomic commit marker LAST
    with open(os.path.join(rdir, "_COMMIT"), "w") as fh:
        json.dump({"round_id": round_id, "wall_s": time.time() - t0}, fh)

    return {
        "round_id": round_id,
        "scheduled": n_sched,
        "fetched": n_ok,
        "failed": n_failed,
        "next_frontier": n_next,
        "wall_s": time.time() - t0,
    }


def init_crawl(
    spark: SparkSession,
    cfg: CrawlConfig,
    seed_urls: list[str] | None = None,
    seed_sitemaps: DataFrame | None = None,
    seed_frontier: DataFrame | None = None,
) -> None:
    """Write the round=-0 bootstrap state (frontier only).

    ``seed_sitemaps`` is a (sitemap_url, body) table of FETCHED
    sitemap XML — the north star's sitemap-driven seeding path: bodies
    are parsed with the pure-Column regex parser (crawl/sitemaps.py)
    and leaf entries become frontier rows via
    ``frontier_from_sitemaps`` (priority = sitemap entry position,
    seq = xxhash64(url)). Include child sitemaps of any
    ``<sitemapindex>`` in the table — nested expansion happens through
    the fetch loop, not here. When both seed forms are given, explicit
    ``seed_urls`` win on duplicate URLs (they carry the caller's
    stated order).

    ``seed_frontier`` is a ready-made FRONTIER_SCHEMA table — the
    recrawl path (crawl/recrawl.py:frontier_from_recrawl feeds the
    stale half of a CDX index back in) or any caller-built frontier.
    Duplicate precedence: seed_urls > seed_sitemaps > seed_frontier."""
    if seed_urls is None and seed_sitemaps is None and seed_frontier is None:
        raise ValueError(
            "init_crawl needs seed_urls, seed_sitemaps and/or seed_frontier"
        )
    frontier = seeds_to_frontier(spark, seed_urls) if seed_urls else None

    def merge(base: DataFrame | None, extra: DataFrame) -> DataFrame:
        if base is None:
            return extra
        return base.unionByName(
            extra.join(base.select("url"), "url", "left_anti")
        )

    if seed_sitemaps is not None:
        from .sitemaps import frontier_from_sitemaps, parse_sitemaps

        frontier = merge(frontier, frontier_from_sitemaps(parse_sitemaps(seed_sitemaps)))
    if seed_frontier is not None:
        frontier = merge(frontier, seed_frontier)
    rdir = _round_dir(cfg, -1)
    _write(frontier, os.path.join(rdir, "frontier"))
    with open(os.path.join(rdir, "_COMMIT"), "w") as fh:
        json.dump({"round_id": -1, "bootstrap": True}, fh)


def run_crawl(
    spark: SparkSession,
    cfg: CrawlConfig,
    pages: DataFrame,
    robots: DataFrame | None,
    seed_urls: list[str] | None,
    n_rounds: int,
    resume: bool = False,
    seed_sitemaps: DataFrame | None = None,
    seed_frontier: DataFrame | None = None,
    blocklist: DataFrame | None = None,
) -> list[dict]:
    """Run (or resume) a crawl for up to ``n_rounds`` rounds.

    Fresh crawls seed from ``seed_urls`` (an ordered list, the
    reference's S1 source), ``seed_sitemaps`` (a (sitemap_url, body)
    table of fetched sitemap XML — the north star's sitemap-driven
    path; see :func:`init_crawl`), or both.

    Resume reads the last committed round and continues — a crashed
    round (no _COMMIT) is replayed identically (all inputs are the
    previous round's immutable committed state)."""
    pages = pages.persist()  # reused by the fetch join every round
    if resume:
        last = last_committed_round(cfg)
        if last is None:
            raise RuntimeError("nothing to resume")
        start = last + 1
    else:
        if seed_urls is None and seed_sitemaps is None and seed_frontier is None:
            raise ValueError(
                "seed_urls, seed_sitemaps and/or seed_frontier required "
                "for a fresh crawl"
            )
        init_crawl(
            spark, cfg, seed_urls,
            seed_sitemaps=seed_sitemaps, seed_frontier=seed_frontier,
        )
        start = 0
    stats = []
    for rid in range(start, start + n_rounds):
        m = run_round(spark, cfg, pages, robots, rid, blocklist=blocklist)
        stats.append(m)
        if m["scheduled"] == 0:
            break
    return stats
