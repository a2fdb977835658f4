"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact). Scale path: IVF-style
bucketed search — assign vectors to coarse centroids, probe only the
nearest ``nprobe`` buckets. All distance math is JVM-side
(``zip_with``/``aggregate`` in double precision); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._materialize import materialize


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (the expected shape: few queries × huge
    corpus), so the corpus never shuffles for the join — one exchange
    on query_id for the top-k window only. Ties broken by neighbor id
    for determinism at any parallelism."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))

    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to)
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_assign_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    cent_id: str = "centroid_id",
    keep_cos: bool = False,
) -> DataFrame:
    """Arrow/BLAS twin of :func:`ivf_assign`: the centroid matrix
    (tiny by definition — it is the k of k-means) is collected once
    and closed over a ``mapInPandas`` pass that scores every batch
    with ONE ``V @ C.T`` matmul and arg-maxes with the same
    (max cosine, lowest centroid id) tie-break. No shuffle at all —
    the corpus is never joined, only mapped — which makes this the
    assignment inner loop for IVF builds / Lloyd iterations at scale
    (the expression path's per-(row × centroid) interpreted HOF dot
    is the q64-profile cost). Row-identical to ivf_assign on the gate
    fixture by test; oracle-gated queries keep the expression path."""
    import numpy as np

    rows = centroids.select(
        F.col(cent_id).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
    ).collect()
    rows.sort(key=lambda r: r["_cid"])  # ascending cid → argmax tie → lowest
    cids = np.array([r["_cid"] for r in rows])
    cmat = np.stack([np.asarray(r["_cv"], dtype=np.float64) for r in rows])
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cid_field = centroids.schema[cent_id].dataType

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("centroid_id", cid_field)]
        + ([StructField("centroid_cos", DoubleType())] if keep_cos else [])
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            vn = np.sqrt((v * v).sum(axis=1))
            cos = (v @ cmat.T) / np.outer(vn, cnorm)
            best = cos.argmax(axis=1)  # first max = lowest cid on ties
            out = pdf.copy()
            out["centroid_id"] = pd.Series(cids[best], index=pdf.index)
            if keep_cos:
                out["centroid_cos"] = pd.Series(
                    cos[np.arange(len(pdf)), best], index=pdf.index
                )
            yield out

    return df.mapInPandas(assign, out_schema)


def ivf_assign(
    df: DataFrame, vec_col: str, id_col: str, centroids: DataFrame,
    cent_id: str = "centroid_id", keep_cos: bool = False,
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    ``centroids`` (small) is broadcast; assignment is a broadcast
    join + per-row argmax — no shuffle of the corpus. This is the
    build step of an IVF index; persist the result partitioned by
    centroid for repeated queries. See :func:`ivf_assign_arrow` for
    the BLAS twin used at corpus scale. ``keep_cos`` retains the
    winning cosine as ``centroid_cos`` (the keep/remove ranking key
    SemDedup needs)."""
    c = centroids.select(
        F.col(cent_id).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    v = df.withColumn("_v", _as_double(F.col(vec_col))).withColumn("_n", _norm(F.col("_v")))
    cos = _dot(F.col("_v"), F.col("_cv")) / (F.col("_n") * F.col("_cn"))
    scored = v.crossJoin(F.broadcast(c)).withColumn("_cos", cos)
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos"), F.asc("_cid"))
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_v", "_n", "_cv", "_cn")
        .withColumnRenamed("_cid", "centroid_id")
    )
    if keep_cos:
        return out.withColumnRenamed("_cos", "centroid_cos")
    return out.drop("_cos")


def label_centroids(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Mean vector per label — a cheap deterministic centroid set
    (k-means would converge here; labels give the partition directly).
    Per-dimension means via posexplode + groupBy — one shuffle."""
    dim = F.size(F.col(vec_col))
    exploded = df.select(
        F.col(label_col).alias("centroid_id"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"),
    )
    means = exploded.groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
    return (
        means.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "centroid_id",
            F.transform("pm", lambda s: s["m"]).alias("centroid"),
        )
    )


def cosine_topk_ivf(
    queries: DataFrame,
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    nprobe: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """ANN top-k: probe only the ``nprobe`` nearest centroids' buckets.

    corpus_assigned must carry ``centroid_id`` (from :func:`ivf_assign`).
    Query→bucket fan-out is a broadcast of (query × nprobe) rows; the
    corpus-side join is an equi-join on centroid_id, so at 100 TB each
    task reads only its bucket — the brute-force cross join never
    materializes."""
    q_assigned = ivf_assign_topn(queries, vec_col, id_col, centroids, nprobe)
    q = q_assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("centroid_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("centroid_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    pairs = c.join(F.broadcast(q), "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to)
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def ivf_assign_topn(
    df: DataFrame, vec_col: str, id_col: str, centroids: DataFrame, n: int
) -> DataFrame:
    """Top-n nearest centroids per vector (the nprobe fan-out)."""
    c = centroids.select(
        F.col("centroid_id").alias("_cid"), _as_double(F.col("centroid")).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    v = df.withColumn("_v", _as_double(F.col(vec_col))).withColumn("_n", _norm(F.col("_v")))
    cos = _dot(F.col("_v"), F.col("_cv")) / (F.col("_n") * F.col("_cn"))
    scored = v.crossJoin(F.broadcast(c)).withColumn("_cos", cos)
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos"), F.asc("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "_v", "_n", "_cv", "_cn", "_cos")
        .withColumnRenamed("_cid", "centroid_id")
    )


def write_ivf_index(
    corpus_assigned: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist an IVF-assigned corpus partitioned BY centroid_id
    (hive-style directories). Repeated ANN queries against the stored
    index then read ONLY the probed buckets — pruning happens at the
    file-listing level, so a 100-TB corpus probe touches ~nprobe/k of
    the data instead of scanning it. This is the bucketing lever the
    mandate calls for on the storage side; the in-memory path
    (:func:`cosine_topk_ivf`) stays the one-shot form."""
    corpus_assigned.write.mode(mode).partitionBy("centroid_id").parquet(path)


def cosine_topk_ivf_indexed(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    nprobe: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """ANN top-k against a STORED IVF index (a DataFrame read from
    :func:`write_ivf_index`'s partitioned layout): the probed
    centroid ids — nprobe × n_queries values, tiny by the
    few-queries × huge-corpus contract — are collected and pushed as
    an explicit ``centroid_id IN (...)`` partition filter, so the
    scan's PartitionFilters prune unprobed buckets at planning time
    (deterministic, unlike relying on runtime dynamic partition
    pruning against an in-memory query frame). Results are identical
    to :func:`cosine_topk_ivf` over the same assignment."""
    q_assigned = ivf_assign_topn(queries, vec_col, id_col, centroids, nprobe)
    probed = [
        r["centroid_id"]
        for r in q_assigned.select("centroid_id").distinct().collect()
    ]
    pruned = index.filter(F.col("centroid_id").isin(probed))
    q = q_assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("centroid_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = pruned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("centroid_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    pairs = c.join(F.broadcast(q), "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to)
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 arithmetic —
    component k,i = (md5-hex8 % 2001 − 1000) / 1000 ∈ [−1, 1]. Both
    engines consume the SAME decimal literals (embedded in the plan
    and in the SQL oracle), so bucket bits match bit-for-bit."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{seed}:hp:{k}:{i}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000) / 1000.0
            for i in range(dim)
        ]
        for k in range(n_planes)
    ]


def hyperplane_lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit k = [dot(v, plane_k) ≥ 0] (Charikar
    sign-random-projection — collision probability 1 − θ/π). Pure
    Column expression, no shuffle; 2^n_planes buckets partition the
    corpus for bucket-restricted near-dup joins (the LSH counterpart
    of the IVF path; mandate: 'IVF or LSH-bucketed')."""
    v = _as_double(vec_col)
    bucket = F.lit(0)
    for k, plane in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in plane])
        dot = _dot(v, arr)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << k)).otherwise(F.lit(0))
    return bucket


def lsh_embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    planes_tables: list[list[list[float]]],
    round_to: int = 6,
) -> DataFrame:
    """Multi-table sign-LSH near-dup: candidate pairs are the union
    over T independent hyperplane sets of per-(table, bucket)
    self-joins; exact cosine verifies every candidate. One table of p
    planes recalls a pair at angle θ with (1−θ/π)^p — OR-ing T tables
    lifts recall to 1−(1−(1−θ/π)^p)^T, the standard LSH amplification.
    Shuffles only on the small (table, bucket) keys; never all-pairs.
    """
    v = _as_double(F.col(vec_col))
    base = df.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("nrm")
    )
    tagged = base.select(
        "id", "v", "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        hyperplane_lsh_bucket(F.col("v"), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(planes_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "v", "nrm", "tb.tbl", "tb.bucket")
    a = tagged.alias("a")
    b = tagged.alias("b")
    cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
            F.col("a.nrm").alias("na"), F.col("b.nrm").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_to)
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def kmeans_refine(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    iterations: int = 1,
    method: str = "expr",
) -> DataFrame:
    """Lloyd refinement from seed centroids: assign every vector to
    its nearest centroid (cosine, ties to the lowest centroid_id via
    ivf_assign_topn) and recompute each centroid as the per-cluster
    mean — repeated ``iterations`` times. Each iteration is one
    broadcast of the SMALL centroid table plus one (cluster, dim)
    groupBy with map-side partial means; the corpus never shuffles on
    anything wider than those keys. Seeds that attract no vectors
    drop out (standard Lloyd behavior).

    ``method="arrow"`` routes the assignment through
    :func:`ivf_assign_arrow` (one ``V @ C.T`` BLAS matmul per Arrow
    batch, shuffle-free, same lowest-cid tie-break — row-identical by
    test): the per-iteration cost drops from an interpreted
    per-(row × centroid) HOF fold to a matmul, which is the Lloyd
    inner loop at corpus scale. The per-cluster means that follow are
    identical either way. Returns (centroid_id, centroid)."""
    if method not in ("expr", "arrow"):
        raise ValueError(f"unknown method {method!r} (expected 'expr' or 'arrow')")
    cur = centroids
    for _ in range(iterations):
        if method == "arrow":
            assigned = ivf_assign_arrow(
                df,
                vec_col,
                id_col,
                cur.select("centroid_id", F.col("centroid").alias(vec_col)),
            )
        else:
            assigned = ivf_assign_topn(df, vec_col, id_col, cur, 1)
        dims = assigned.select(
            "centroid_id",
            F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"),
        )
        means = dims.groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
        cur = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id", F.transform("pm", lambda s: s["m"]).alias("centroid")
            )
        )
    return cur

def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    threshold: float = 0.95,
    method: str = "expr",
) -> DataFrame:
    """SemDedup — semantic (embedding-space) deduplication via
    cluster-restricted cosine neighborhoods (Abbas et al. 2023,
    arXiv:2303.09540). Items are assigned to their nearest centroid;
    within each cluster, pairs with cosine ≥ ``threshold`` are
    semantic duplicates, and from every duplicate neighborhood the
    item FARTHEST from its centroid survives (the paper's keep-low-
    centroid-similarity policy: the retained example is the least
    prototypical one). Deterministically: an item is removed iff some
    cosine-neighbor has a strictly lower (centroid_cos, id) key — so
    each neighborhood's local minima survive and every removal is
    justified by a surviving-or-lower neighbor, replayable in SQL.

    Scale shape: assignment broadcasts the centroid matrix — with
    ``method="arrow"`` it is a shuffle-free mapInPandas BLAS argmax
    (the expr twin instead pays a per-id window shuffle, fine at
    gate scale, wrong at 100 TB); the pair search is
    :func:`~web_scraper_spark.operators.
    dedup.embedding_near_dups` restricted per cluster (one exchange on
    centroid_id — never all-pairs; ``method="arrow"`` computes each
    cluster's cosine matrix as one BLAS matmul); the removal rule is
    two id-keyed joins of the SMALL pair table against the per-item
    key. Nothing exchanges on anything wider than (centroid_id) or
    (id). Cosines are rounded to 6 before comparison — engine-portable
    keys (CLAUDE.md determinism idioms).

    Returns (id, centroid_id, centroid_cos, removed)."""
    from .dedup import embedding_near_dups

    if vec_col not in centroids.columns and "centroid" in centroids.columns:
        # accept label_centroids/kmeans_refine output (centroid_id, centroid)
        centroids = centroids.select(
            "centroid_id", F.col("centroid").alias(vec_col)
        )
    if method == "arrow":
        # shuffle-free BLAS argmax — the expr twin's per-id window
        # would re-shuffle the whole corpus just to pick the max
        assigned = ivf_assign_arrow(df, vec_col, id_col, centroids, keep_cos=True)
    else:
        assigned = ivf_assign(df, vec_col, id_col, centroids, keep_cos=True)
    pairs = embedding_near_dups(
        assigned, vec_col, id_col, threshold,
        bucket_col="centroid_id", method=method,
    )
    key = assigned.select(
        F.col(id_col).alias("_kid"), F.round("centroid_cos", 6).alias("_kcos")
    )
    edges = pairs.select(
        F.col("id_a").alias("_x"), F.col("id_b").alias("_y")
    ).unionByName(pairs.select(F.col("id_b").alias("_x"), F.col("id_a").alias("_y")))
    keyed = (
        edges.join(
            key.select(F.col("_kid").alias("_x"), F.col("_kcos").alias("_xcos")), "_x"
        ).join(
            key.select(F.col("_kid").alias("_y"), F.col("_kcos").alias("_ycos")), "_y"
        )
    )
    removed = (
        keyed.filter(
            (F.col("_ycos") < F.col("_xcos"))
            | ((F.col("_ycos") == F.col("_xcos")) & (F.col("_y") < F.col("_x")))
        )
        .select(F.col("_x").alias(id_col))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        assigned.join(removed, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.round("centroid_cos", 6).alias("centroid_cos"),
            F.coalesce("_rm", F.lit(False)).alias("removed"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    qid_col: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    persist: bool = False,
    dense: bool = False,
    prefilter_mod: int = 0,
    method: str = "expr",
) -> DataFrame:
    """Lexical similarity search: BM25 top-k retrieval over an
    inverted index built from the corpus — the sparse complement to
    the embedding-cosine family (reference analog: none; this is a
    training-data-pipeline addition, e.g. dedup-aware retrieval or
    decontamination lookup by keyword).

    Scoring is Robertson/Spärck-Jones BM25:
    ``idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`` and
    ``tf_c = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``, summed over
    the query's DISTINCT terms. Engine portability: each term's
    contribution is quantized to integer MICROS
    (``round(idf·tf_c·1e6)`` as BIGINT) before the per-(query, doc)
    sum — integer sums are order-independent, so the oracle
    hash-matches regardless of aggregation schedule. Ranking carries
    the unique (score desc, doc_id asc) tie-break.

    Scale shape: the inverted index is one explode + one
    (doc, term) groupBy — the document length rides the explode as a
    carried column, so there is NO doc-keyed length join-back;
    document frequency is one (term) groupBy. The query-term
    restriction is applied FIRST (queries ≪ corpus, broadcast), so
    per-term statistics join the index as a second broadcast: after
    the two index-build exchanges (doc+term groupBy, term groupBy),
    scoring itself shuffles nothing but the per-(query, doc) partial
    sums. ``max_df_frac`` drops terms appearing in more than that
    fraction of documents — the stopword/hot-posting-list cap that
    bounds the worst key in the broadcast term probe (a term in half
    the corpus is pure skew and carries ~no BM25 signal anyway;
    drops are by the same df-cap rule on both engines). Per-query
    top-k is one window over query_id — fine while queries fit a
    partition each; at huge query batches swap the window for
    groupBy + slice(sort_array(...)).

    ``persist=True`` caches the (doc, term, tf, dl) index between its
    two consumers (document frequency and scoring) — without it the
    tokenize+explode subtree runs once per consumer (no
    ReusedExchange: the subtrees differ past the aggregate). The
    returned DataFrame is then materialized (localCheckpoint) so the
    cache can be released here — same contract as
    ``duplicate_spans(persist=True)``. At 100 TB this is the
    difference between one and three corpus scans; default off for
    small inputs where the extra materialization costs more than the
    recompute.

    ``dense=True`` selects the dense-corpus scoring shape (optimization
    guide §2.3/§2.4 "shuffle keys and metadata, aggregate before you
    shuffle" applied to retrieval): when query terms hit a constant
    fraction of the corpus — tiny vocabularies, stopword-heavy query
    logs — the inverted-index join emits Θ(|pairs|·|terms/query|) rows
    that must then be re-aggregated per (query, doc) through an
    exchange with ~|Q|·|N| groups, which dominates the runtime. The
    dense path instead computes, IN-ROW and with zero extra exchanges:
    (1) a per-document term-frequency map from the sorted token array,
    (2) a per-document term→contrib map (same BM25 double arithmetic,
    restricted to uncapped query terms via a broadcast idf map), and
    (3) the per-(query, doc) score by probing that map with each
    query's distinct terms under a broadcast nested-loop over the
    (assumed small) query side — pairs with no matching uncapped term
    are dropped, exactly the inverted index's candidate set. Only the
    final top-k window shuffles, and WindowGroupLimit bounds what it
    moves. For SELECTIVE workloads (big vocabulary, rare query terms)
    keep ``dense=False``: there the index join emits few candidates
    and the all-pairs enumeration would be Θ(|Q|·N).

    ``prefilter_mod`` (dense path only, 0 = off) inserts an exact
    sample-derived score floor before the ranking window: the k-th
    best score over the 1/mod deterministic document subsample
    (xxhash64-bucketed) is a LOWER bound on the k-th best over all
    documents, so filtering the full pair stream to ``score >= floor``
    before the exchange keeps every true top-k row while cutting the
    window's input by ~mod× (the WAND-style upper-bound idea, with a
    sound bound from a subsample instead of term maxima).

    Returns (query_id, doc_id, rank, score_micros, n_terms).
    """
    tok = lambda c: F.split(
        F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " "
    )
    if dense:
        return _bm25_topk_dense(
            docs, queries, text_col, id_col, q_text_col, qid_col,
            k, k1, b, max_df_frac, persist, prefilter_mod, tok, method,
        )
    base = docs.select(F.col(id_col).alias("doc_id"), tok(F.col(text_col)).alias("t"))
    tf = (
        base.select(
            "doc_id",
            F.size("t").cast("long").alias("dl"),
            F.explode("t").alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
    )
    if persist:
        tf = tf.persist()
    stats = base.select(F.size("t").cast("long").alias("dl")).agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(tok(F.col(q_text_col))).alias("term"),
    ).distinct()
    # per-term stats restricted to query terms (tiny), df cap applied
    # here — non-query terms never score, so the cap's reach is
    # unchanged — then broadcast onto the index
    term_stats = (
        dfreq.join(F.broadcast(qterms.select("term").distinct()), "term")
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("df")
            <= F.floor(F.lit(max_df_frac) * F.col("n")).cast("long")
        )
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    tfc = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * ((1 - b) + b * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(term_stats), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfc * 1000000).cast("long").alias("contrib"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score_micros"),
        F.count("*").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micros").desc(), F.col("doc_id")
    )
    out = (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_micros", "n_terms")
    )
    if persist:
        out = materialize(out)
        tf.unpersist()
    return out


def _bm25_topk_dense(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    q_text_col: str,
    qid_col: str,
    k: int,
    k1: float,
    b: float,
    max_df_frac: float,
    persist: bool,
    prefilter_mod: int,
    tok,
    method: str = "expr",
) -> DataFrame:
    """Dense-corpus BM25 scoring shape (see :func:`bm25_topk`,
    ``dense=True``). Bit-identical to the inverted-index path: corpus
    stats, df cap and the per-(term, doc) contribution keep the
    sparse path's exact arithmetic (for ``method="arrow"`` the
    contribution is evaluated in float64 with the identical IEEE
    operation order, idf/avgdl are COLLECTED from the JVM-computed
    term table so no libm difference can leak in, and the HALF_UP
    micros rounding is floor(x+0.5) — exactly BigDecimal HALF_UP for
    0 ≤ x < 2^52); only the per-(query, doc) aggregation moves — from
    a post-join groupBy over the Θ(pairs × terms) row stream into an
    in-row / in-batch sum (integer micros are order-independent, so
    the sum is the same BIGINT either way)."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    # round-robin repartition ahead of the explode: a compact parquet
    # file may plan only 1-2 input splits, which would serialize the
    # tokenize+aggregate work; scale-adaptive count, rows-only shuffle
    base = docs.select(
        F.col(id_col).alias("doc_id"), tok(F.col(text_col)).alias("t")
    ).repartition(n_parts)
    if persist and method == "arrow":
        base = base.persist()
    stats = base.select(F.size("t").cast("long").alias("dl")).agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qdf = queries.select(
        F.col(qid_col).alias("query_id"),
        F.array_distinct(tok(F.col(q_text_col))).alias("qt"),
    )
    qterm_df = qdf.select(F.explode("qt").alias("term")).distinct()

    tf = None
    if method == "arrow":
        # document frequency straight from the distinct-terms-per-doc
        # explode (== the tf table's groupBy(term) count) — the
        # (doc, term) pre-aggregation exchange disappears entirely;
        # term counting happens per document in the scorer below
        dfreq = (
            base.select(F.explode(F.array_distinct("t")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
    else:
        # tf table: VERBATIM the sparse path
        tf = (
            base.select(
                "doc_id",
                F.size("t").cast("long").alias("dl"),
                F.explode("t").alias("term"),
            )
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
        )
        if persist:
            tf = tf.persist()
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    term_stats = (
        dfreq.join(F.broadcast(qterm_df), "term")
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("df")
            <= F.floor(F.lit(max_df_frac) * F.col("n")).cast("long")
        )
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    # the surviving (df-capped, query-restricted) term set is tiny by
    # the operator's contract → dense integer term ids
    term_ids = term_stats.withColumn(
        "_tid", F.row_number().over(Window.orderBy("term")) - 1
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micros").desc(), F.col("doc_id")
    )

    if method == "arrow":
        # --- BLAS scoring (guide §4.2): ONE corpus-side exchange — a
        # groupBy(doc_id) that collects each document's matched term
        # ids (token explode ⨝ broadcast term ids; capped/non-query
        # tokens drop here, so documents with no uncapped query term
        # vanish exactly like the inverted index's candidate set).
        # Per batch the scorer bincounts tids into the tf matrix and
        # scores every (doc, query) pair with one C @ M.T matmul
        # (float64 exact: all values integers < 2^53). Each batch
        # emits only rows at or above its per-query k-th score (ties
        # kept conservatively), so the final exact window ranks
        # ~nq·k rows per batch instead of |Q|·N pairs.
        import numpy as np
        from pyspark.sql.types import LongType, StructField, StructType

        trows = term_ids.select(
            "term", "_tid", idf.alias("_idf"), "avgdl"
        ).collect()
        trows.sort(key=lambda r: r["_tid"])
        nv = len(trows)
        idf_arr = np.array([r["_idf"] for r in trows], dtype=np.float64)
        avgdl = float(trows[0]["avgdl"]) if trows else 1.0
        tid_map_rows = [(r["term"], r["_tid"]) for r in trows]
        tid_df = docs.sparkSession.createDataFrame(
            tid_map_rows, "term string, _tid int"
        ) if tid_map_rows else None

        qrows = qdf.collect()
        nq = len(qrows)
        term_to_tid = dict(tid_map_rows)
        qid_vals = [r["query_id"] for r in qrows]
        qt_sets = [
            sorted(
                {
                    term_to_tid[t]
                    for t in (r["qt"] or [])
                    if t in term_to_tid
                }
            )
            for r in qrows
        ]
        M = np.zeros((nq, nv), dtype=np.float64)
        for j, ts in enumerate(qt_sets):
            for t in ts:
                M[j, t] = 1.0
        k1_ = float(k1)
        b_ = float(b)

        out_schema = StructType(
            [
                StructField("query_id", qdf.schema["query_id"].dataType),
                StructField("doc_id", base.schema["doc_id"].dataType),
                StructField("score_micros", LongType()),
                StructField("n_terms", LongType()),
            ]
        )

        def score_batches(batches):
            import pandas as pd

            for pdf in batches:
                nb = len(pdf)
                if not nb or not nq or not nv:
                    continue
                C = np.zeros((nb, nv), dtype=np.float64)
                for r, tids in enumerate(pdf["tids"]):
                    C[r] = np.bincount(
                        np.asarray(tids, dtype=np.int64), minlength=nv
                    )
                dl = pdf["dl"].to_numpy().astype(np.float64)
                # EXACT sparse-path op order:
                # tfc = (tf*(k1+1)) / (tf + ((dl/avgdl)*b + (1-b))*k1)
                dn = ((dl / avgdl) * b_ + (1.0 - b_)) * k1_
                tfc = (C * (k1_ + 1.0)) / (C + dn[:, None])
                contrib = np.floor(idf_arr[None, :] * tfc * 1000000.0 + 0.5)
                P = C > 0
                contrib = np.where(P, contrib, 0.0)
                S = contrib @ M.T
                N = P.astype(np.float64) @ M.T
                S = np.where(N > 0, S, -1.0)
                kk = min(k, nb)
                thr = -np.partition(-S, kk - 1, axis=0)[kk - 1, :]
                ids = pdf["doc_id"].to_numpy()
                doc_out, qj_out, s_out, n_out = [], [], [], []
                for j in range(nq):
                    mask = (N[:, j] > 0) & (S[:, j] >= thr[j])
                    idx = np.nonzero(mask)[0]
                    if not len(idx):
                        continue
                    doc_out.append(ids[idx])
                    qj_out.append(np.full(len(idx), j))
                    s_out.append(S[idx, j])
                    n_out.append(N[idx, j])
                if not doc_out:
                    continue
                qj = np.concatenate(qj_out)
                yield pd.DataFrame(
                    {
                        "query_id": [qid_vals[j] for j in qj],
                        "doc_id": np.concatenate(doc_out),
                        "score_micros": np.concatenate(s_out).astype(
                            np.int64
                        ),
                        "n_terms": np.concatenate(n_out).astype(np.int64),
                    }
                )

        if tid_df is None:
            # no uncapped query terms → empty result, correct schema
            cand = docs.sparkSession.createDataFrame([], out_schema)
        else:
            gro = (
                base.select(
                    "doc_id",
                    F.size("t").cast("long").alias("dl"),
                    F.explode("t").alias("term"),
                )
                .join(F.broadcast(tid_df), "term")
                .groupBy("doc_id")
                .agg(
                    F.min("dl").alias("dl"),
                    F.collect_list("_tid").alias("tids"),
                )
            )
            cand = gro.mapInPandas(score_batches, out_schema)
        out = (
            cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score_micros", "n_terms")
        )
        if persist:
            out = materialize(out)
            base.unpersist()
        return out

    # --- expression path: per-(term, doc) contribution (the sparse
    # path's Project), folded into a positional per-doc array probed
    # with codegen F.get — O(1) vs the string-keyed map scan
    tfc = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * ((1 - b) + b * (F.col("dl") / F.col("avgdl")))
    )
    contribs = tf.join(F.broadcast(term_ids), "term").select(
        "doc_id",
        "_tid",
        F.round(idf * tfc * 1000000).cast("long").alias("_c"),
    )
    nv_row = term_ids.agg(F.count("*").alias("_nv"))
    carr = F.transform(
        F.sequence(F.lit(0), F.col("_nv") - 1),
        lambda i: F.try_element_at(F.col("_m"), i),
    )
    cdocs = (
        contribs.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_tid"), F.col("_c")))
            ).alias("_m")
        )
        .crossJoin(F.broadcast(nv_row))
        .select("doc_id", carr.alias("carr"))
    )
    if persist:
        cdocs = cdocs.persist()

    # --- query terms → dense ids (small side, the interpreted HOF
    # lookup cost is per QUERY row, not per pair)
    idmap_row = term_ids.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("term"), F.col("_tid")))
        ).alias("_idmap")
    )
    qids = qdf.crossJoin(F.broadcast(idmap_row)).select(
        "query_id",
        F.transform(
            F.col("qt"), lambda t: F.try_element_at(F.col("_idmap"), t)
        ).alias("qtid"),
    )

    # --- pair scores in-row: probe the contrib array with each
    # query's term ids under a broadcast nested-loop over the small
    # query side; pairs with no uncapped matching term are dropped.
    # Probes are expanded to FIXED per-term slots (slot count = the
    # query side's max distinct term count, read with one tiny action
    # on the small side): F.get/try_element_at are whole-stage-codegen
    # while transform/filter/aggregate HOFs are interpreted
    # CodegenFallback (guide §4.1).
    max_qt = qdf.agg(F.max(F.size("qt"))).first()[0] or 0
    slots = max(int(max_qt), 1)

    def _pairs(sd: DataFrame) -> DataFrame:
        p = sd.crossJoin(F.broadcast(qids))
        p = p.select(
            "query_id",
            "doc_id",
            *[
                F.get(
                    F.col("carr"), F.try_element_at(F.col("qtid"), F.lit(i))
                ).alias(f"_c{i}")
                for i in range(1, slots + 1)
            ],
        )
        zero = F.lit(0).cast("long")
        score = F.coalesce(F.col("_c1"), zero)
        n_terms = F.col("_c1").isNotNull().cast("int")
        for i in range(2, slots + 1):
            score = score + F.coalesce(F.col(f"_c{i}"), zero)
            n_terms = n_terms + F.col(f"_c{i}").isNotNull().cast("int")
        return p.select(
            "query_id",
            "doc_id",
            score.alias("score_micros"),
            n_terms.cast("long").alias("n_terms"),
        ).filter(F.col("n_terms") > 0)

    pairs = _pairs(cdocs)
    if prefilter_mod > 1:
        # exact score floor from a deterministic 1/mod doc subsample:
        # the k-th best subsample score per query can only UNDERSHOOT
        # the true k-th best, so `score >= floor` keeps all top-k rows
        sample = cdocs.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(prefilter_mod)) == 0
        )
        thr = (
            _pairs(sample)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == k)
            .select("query_id", F.col("score_micros").alias("_floor"))
        )
        pairs = pairs.join(F.broadcast(thr), "query_id", "left").filter(
            F.col("score_micros")
            >= F.coalesce(F.col("_floor"), F.lit(-(1 << 62)).cast("long"))
        ).drop("_floor")
    out = (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_micros", "n_terms")
    )
    if persist:
        out = materialize(out)
        cdocs.unpersist()
        tf.unpersist()
    return out
