"""Training-batch assembly operators: sequence packing + stratified
sampling.

Both are pure window programs — deterministic, shuffle-once, and
exactly SQL-expressible (oracle-checked), which is what lets them run
unchanged at 10⁹ documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from methyl_data_pipeline_spark.functions.scalar import normalize_label


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    window_tokens: int = 2048,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid end-to-end in
    deterministic ``id_col`` order (per shard) and the stream is cut
    every ``window_tokens`` tokens — the standard pretraining packing.
    Emits per-doc placement: ``bin_idx`` (which context window the doc
    STARTS in), ``bin_offset`` (token offset of the doc's start within
    that window), and ``spans_boundary`` (doc crosses into the next
    window and will be split by the chunker).

    One window pass (running sum); with ``shard_col`` the windows are
    per-shard, so no global ordering bottleneck — shards are the unit
    of parallelism exactly as in a real tokenized-corpus layout.
    """
    part = [shard_col] if shard_col else []
    w = Window.partitionBy(*part).orderBy(F.col(id_col).asc())
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    out = df.withColumn("_start", start).select(
        *([shard_col] if shard_col else []),
        id_col,
        token_col,
        (F.col("_start") / window_tokens).cast("long").alias("bin_idx"),
        (F.col("_start") % window_tokens).alias("bin_offset"),
        (
            (F.col("_start") / window_tokens).cast("long")
            != (
                (F.col("_start") + F.greatest(F.col(token_col), F.lit(1)) - 1)
                / window_tokens
            ).cast("long")
        ).alias("spans_boundary"),
    )
    return out


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by md5-hash order of the id — a deterministic,
    seed-free shuffle that is reproducible in any engine (unlike
    ``sample()``'s partition-order-dependent RNG). One shuffle on the
    stratum key; rank via row_number inside each stratum.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by keyed 60-bit md5
    hash: the same id lands in the same split at any partitioning,
    cluster size, or re-run — no RNG state, no shuffle (a pure
    projection the optimizer can push anywhere). ``weights`` are
    normalized shares of the hash space; division by 2^60 is exact in
    binary floating point, so the thresholds are engine-independent.
    Each cumulative boundary is rounded to 12 decimals so float
    accumulation (0.9 + 0.05 → 0.9500000000000001) can't open a 1-ulp
    window where this engine and an oracle comparing against the plain
    decimal literal (0.95) assign the same id to different splits.
    """
    from methyl_data_pipeline_spark.ext.text import md5_long

    frac = md5_long(F.col(id_col).cast("string"), salt=salt) / F.lit(
        float(1 << 60)
    )
    return df.withColumn("split", _split_ladder(frac, weights, names))


def _split_ladder(frac, weights, names):
    """Hash-fraction → split-name CASE ladder shared by the id-keyed
    and fingerprint-keyed splits. Cumulative boundaries are rounded to
    12 decimals (see ``hash_split``'s docstring)."""
    if len(weights) != len(names) or len(names) < 2:
        raise ValueError("need >= 2 (weight, name) pairs of equal length")
    total = float(sum(weights))
    acc = 0.0
    expr = None
    for w_, nm in zip(weights[:-1], names[:-1]):
        acc = round(acc + w_ / total, 12)
        expr = (
            F.when(frac < acc, nm)
            if expr is None
            else expr.when(frac < acc, nm)
        )
    return expr.otherwise(names[-1])


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment keyed by the CONTENT fingerprint
    (md5 of whitespace/case-normalized text) instead of the doc id:
    exact duplicates — the classic train→eval leakage channel — land
    in the same split by construction, at any partitioning and with no
    dedup pass required first. NULL-text docs fall back to the id key
    (nothing to leak). Zero-shuffle projection, same hash-space ladder
    as ``hash_split`` so the two keyings are directly comparable.

    Emits ``fingerprint`` alongside ``split`` so a downstream audit
    can certify zero cross-split fingerprints.
    """
    from methyl_data_pipeline_spark.ext.text import md5_long

    key = F.coalesce(
        normalize_label(F.col(text_col)), F.col(id_col).cast("string")
    )
    fp = md5_long(key, salt=salt)
    frac = fp / F.lit(float(1 << 60))
    return df.withColumn("fingerprint", fp).withColumn(
        "split", _split_ladder(frac, weights, names)
    )


def mixture_sample(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    id_col: str = "doc_id",
    target: dict[str, float] | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Materialize :func:`~methyl_data_pipeline_spark.ext.text.domain_mix`'s
    rebalance weights as an actual subsample: each document is kept iff
    its keyed hash fraction falls under its domain's sampling rate
    ``weight / max(weight)`` — the discard-only normalization that hits
    the target token mixture in expectation while keeping every
    document of the scarcest domain. Deterministic Bernoulli (md5
    threshold, no RNG), so the sample is reproducible and
    oracle-checkable.

    Plan: the per-domain rate table is tiny (one row per source) and
    broadcast onto the scan — the fact table is never shuffled.
    """
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.ext.text import domain_mix, md5_long

    # persisted: domain-cardinality-sized, but its lineage is a full
    # corpus token aggregate — the max() branch and the rate join would
    # otherwise each re-run that corpus scan (measured 5 scans at
    # sf0.01 without the persist)
    rates = cache.track(
        domain_mix(df, text_col=text_col, domain_col=domain_col, target=target)
    )
    maxw = rates.agg(F.max("weight").alias("_mw"))
    rates = (
        rates.crossJoin(F.broadcast(maxw))
        .select(
            F.col("domain").alias(domain_col),
            (F.col("weight") / F.col("_mw")).alias("_rate"),
        )
    )
    frac = md5_long(F.col(id_col).cast("string"), salt=salt) / F.lit(
        float(1 << 60)
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(frac < F.col("_rate"))
        .drop("_rate")
    )


def temperature_sample(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled domain sampling (the multilingual-training
    alpha-mixture: target share ∝ natural share^alpha, ``alpha < 1``
    upweights scarce domains). Materialized discard-only: each doc is
    kept iff its keyed hash fraction falls under its domain's rate
    ``(min_tokens / domain_tokens)^(1 - alpha)`` — the closed form of
    ``weight_i / max_j weight_j`` for the alpha target, so the
    scarcest domain keeps everything and no cross-domain
    normalization SUM exists (rates derive from two integers and one
    root/power — bit-reproducible in any engine; a float sum over
    domains would be summation-order-dependent).

    ``alpha=1`` is a no-op (natural mixture), ``alpha=0`` is the
    uniform rebalance of :func:`mixture_sample`. Plan: tiny per-domain
    rate table broadcast onto the scan; the corpus is never shuffled.
    """
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.ext.text import md5_long, n_words_nullsafe

    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha in [0, 1]")
    # persisted: domain-sized frame over a corpus-scan lineage — the
    # min() branch would otherwise re-run the token aggregate scan
    per = cache.track(
        df.groupBy(domain_col).agg(
            F.sum(n_words_nullsafe(text_col)).cast("long").alias("_tok")
        )
    )
    mn = per.agg(F.min("_tok").alias("_mn"))
    ratio = F.col("_mn") / F.col("_tok")
    e = 1.0 - alpha
    # sqrt is IEEE-correctly-rounded (pow is not): use it when exact
    rate = (
        F.sqrt(ratio) if e == 0.5
        else ratio if e == 1.0
        else F.lit(1.0) if e == 0.0
        else F.pow(ratio, F.lit(e))
    )
    rates = per.crossJoin(F.broadcast(mn)).select(
        F.col(domain_col), rate.alias("_rate")
    )
    frac = md5_long(F.col(id_col).cast("string"), salt=salt) / F.lit(
        float(1 << 60)
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(frac < F.col("_rate"))
        .drop("_rate")
    )


def length_bucket_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 16,
    n_shards: int = 8,
    buckets: tuple[int, ...] = (16, 32, 64, 128, 256, 512),
    salt: str = "batch",
) -> DataFrame:
    """Length-bucketed dynamic batching — the padding-efficiency
    batch assembler for variable-length training/inference: documents
    are bucketed by token count (geometric CASE ladder — integer
    thresholds, so the bucket function is bit-identical in any
    engine), sharded by keyed hash (each data-parallel worker
    assembles its own batches — no per-bucket global order, so no
    one-task bottleneck at corpus scale), deterministically ordered
    inside each (bucket, shard) by the same hash, and cut into
    batches of ``batch_size``. Emits per-batch stats; ``padding`` =
    ``n_docs * max_tokens - sum_tokens`` is the token waste a
    pad-to-longest collator would spend on that batch (the number
    the bucketing exists to minimize).

    Plan shape: one shuffle (the (bucket, shard) window) + the
    per-batch partial aggregate; NULL-text docs are dropped up front
    (nothing to batch). Deterministic end-to-end: md5 order, no RNG.
    """
    from methyl_data_pipeline_spark.ext.text import md5_long

    if batch_size < 1 or n_shards < 1 or not buckets:
        raise ValueError("need batch_size >= 1, n_shards >= 1, buckets")
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    n = F.size(ws).cast("long")
    bucket = F.when(n <= buckets[0], F.lit(buckets[0]))
    for b in buckets[1:]:
        bucket = bucket.when(n <= b, F.lit(b))
    # overflow bucket: docs longer than the largest threshold still
    # batch together (pad-to-longest within the open-ended bucket)
    bucket = bucket.otherwise(F.lit(2 * buckets[-1])).cast("long")
    h = md5_long(F.col(id_col).cast("string"), salt=salt)
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n.alias("n_tokens"),
        bucket.alias("bucket"),
        (h % n_shards).cast("long").alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    placed = toks.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    return placed.groupBy("bucket", "shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias(
            "padding"
        ),
    )


def budget_select(
    df: DataFrame,
    score_col: str,
    token_col: str = "n_tokens",
    budget: int = 1_000_000,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Quality-ranked data selection under a global token budget: rank
    every document by (``score_col`` DESC, ``id_col`` ASC) — a total
    order, so the result is unique — and keep the best-first prefix
    whose running token total stays within ``budget``. The standard
    "select the best N tokens for training" operator.

    The naive formulation is one global running-sum window — a single
    task holding the whole corpus. This is the distributed exact path
    (same decomposition as :func:`stats.bh.bh_adjust_scalable`):
    ``repartitionByRange`` on the rank key keeps rows globally ordered
    ACROSS partitions while each partition windows locally; the
    running total then equals the local prefix sum plus a
    per-partition token-total offset — one O(num_partitions) scalar
    collect, broadcast back as a literal map. Bit-identical to the
    global window at any partition count.

    Emits the kept rows with ``cum_tokens`` (running total including
    the row) and global ``rank``; NULL scores/token counts are dropped
    (unrankable).
    """
    from methyl_data_pipeline_spark import cache

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    ranged = (
        df.filter(F.col(score_col).isNotNull() & F.col(token_col).isNotNull())
        .repartitionByRange(num_partitions, *order)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    local = cache.track(
        ranged.withColumn("_lrank", F.row_number().over(w_local)).withColumn(
            "_lsum", F.sum(token_col).over(w_local).cast("long")
        )
    )
    # tiny aggregate: per-partition row counts + token totals -> offsets
    stats = (
        local.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(token_col).cast("long").alias("_tok"),
        )
        .orderBy("_pid")
    ).collect()
    rank_off: dict[int, int] = {}
    tok_off: dict[int, int] = {}
    racc = tacc = 0
    for r in stats:
        rank_off[r["_pid"]] = racc
        tok_off[r["_pid"]] = tacc
        racc += r["_cnt"]
        tacc += r["_tok"]
    rank_map = F.create_map(*[F.lit(x) for kv in rank_off.items() for x in kv])
    tok_map = F.create_map(*[F.lit(x) for kv in tok_off.items() for x in kv])

    return (
        local.withColumn("rank", F.col("_lrank") + rank_map[F.col("_pid")])
        .withColumn(
            "cum_tokens", F.col("_lsum") + tok_map[F.col("_pid")]
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("_pid", "_lrank", "_lsum")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / long-document
    pretraining splitter: chunk ``i`` covers tokens
    ``[i*stride, i*stride + window)`` of the whitespace-normalized
    text, with ``window - stride`` tokens of overlap carrying context
    across boundaries; documents at or under ``window`` tokens yield
    one chunk. A pure 1:N projection (sequence → posexplode →
    array slice), zero shuffles — the chunker runs inside the scan at
    any corpus size.

    Output: one row per chunk with ``chunk_idx``, ``start_tok``
    (0-based), ``n_chunk_tokens``, ``chunk_text``.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    # whitespace squeeze ONLY — chunk_text feeds training/RAG, so case
    # must survive (normalize_label's lowercasing is for join keys and
    # fingerprints, not content)
    ws = F.split(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " "
    )
    n = F.size(ws)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(float(stride))) + 1
    )
    out = df.select(
        F.col(id_col), ws.alias("_ws"), n.alias("_n"), n_chunks.alias("_nc")
    ).select(
        id_col,
        "_ws",
        "_n",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
            "_pos", "chunk_idx"
        ),
    )
    start = F.col("chunk_idx") * stride
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(window), F.col("_n") - start).cast("long").alias(
            "n_chunk_tokens"
        ),
        F.concat_ws(" ", F.slice("_ws", start + 1, window)).alias("chunk_text"),
    )


def source_token_cap(
    df: DataFrame,
    score_col: str,
    cap: int,
    group_col: str = "source",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token cap: within each ``group_col`` (domain, crawl,
    source shard) rank documents by (``score_col`` DESC, ``id_col``
    ASC) and keep the best-first prefix whose running token total stays
    within ``cap`` — the "no single domain dominates the mixture"
    curation primitive (cap Wikipedia at N tokens, keep its best docs),
    the per-group complement of the global :func:`budget_select`.

    Plan: ONE shuffle on the group key; the per-group running sum is a
    streaming window over the shuffle's own sort order, so memory is
    spill-backed regardless of group size. The scale limit is
    PARALLELISM, not memory — each group is one task, which is the
    right trade when groups are domains (thousands of them); for a
    corpus that is one giant source, use :func:`budget_select` on the
    slice instead (its range-partition decomposition parallelizes a
    single ordered prefix).

    NULL scores / token counts drop (unrankable); a NULL group is its
    own group (both engines partition NULLs together). Emits kept rows
    with the in-group ``rank`` and running ``cum_tokens``.
    """
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    # ROWS frame, explicitly: Spark's default frame for an ordered
    # window is RANGE, under which ordering-key PEERS (duplicate
    # (score, id) rows — nothing in this public kernel validates id
    # uniqueness) all receive the inflated shared total and the whole
    # prefix can come back empty; the DuckDB oracle and the row_number
    # rank both use ROWS semantics.
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        df.filter(F.col(score_col).isNotNull() & F.col(token_col).isNotNull())
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("cum_tokens", F.sum(token_col).over(w_rows).cast("long"))
    )
    return ranked.filter(F.col("cum_tokens") <= cap).select(
        group_col, id_col, score_col, token_col, "rank", "cum_tokens"
    )
