"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, O(n·q), JVM-side
(`F.aggregate`/`zip_with` dot products, no UDF). Scale path: LSH
bucketing (random hyperplane signs) so each query only scans its
bucket; recall tunable via number of planes/tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def valid_vector(c: Column) -> Column:
    """The similarity family's pinned input contract: a usable vector
    is non-NULL, non-empty, fully finite, and has nonzero norm.

    Every operator below filters on this BEFORE any arithmetic — the
    pathological shapes are not edge cases at corpus scale (failed
    embedders emit NULLs, truncated rows emit empties, dead documents
    emit zero vectors) and each one breaks a different layer: an empty
    array crashes ``vec[0]`` under ANSI, a zero norm crashes the
    cosine division, a NULL/empty reaching a driver-side
    ``np.asarray`` goes ragged, and a NaN or ±Inf component DIVERGES
    cross-engine instead of crashing (an Inf norm makes the cosine
    Inf/Inf = NaN, and DuckDB sorts/compares NaN as greatest —
    ``NaN >= threshold`` is TRUE there, false in Spark; Spark itself
    ranks NaN greatest in ORDER BY, polluting top-k). The DuckDB
    oracles replay the same clauses.
    """
    inf = float("inf")
    return (
        c.isNotNull()
        & (F.size(c) > 0)
        & ~F.exists(c, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == inf))
        & F.exists(c, lambda x: x != 0.0)
    )


def _first_dim(vectors: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row, with a clear error
    instead of a TypeError when the corpus is empty or the first
    embedding is null."""
    row = vectors.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(
            "cannot infer embedding dimension: empty vectors frame or "
            f"null first {vec_col!r}"
        )
    return len(row[0])


def _plane_bucket(planes):
    """Sign-pattern bucket closure for a hyperplane matrix — the ONE
    definition both LSH variants share (a drifted copy would silently
    put the two variants in different bucket spaces)."""

    def bucket(vc: Column) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vc,
                        F.array(*[F.lit(float(x)) for x in row]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for row in planes
        ]
        return F.concat(*bits)

    return bucket


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is usually small → broadcast; the corpus side streams
    through a single map stage, and the per-query top-k is a window over
    the (query, corpus) pairs. Exact brute force is the correctness
    baseline; use :func:`lsh_bucketed_topk` at corpus scale.
    """
    # pinned input contract (see valid_vector): NULL/empty/NaN/zero
    # vectors drop on BOTH sides before any arithmetic
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    queries = queries.filter(valid_vector(F.col(vec_col)))
    # cast float32 storage to float64 before arithmetic so results are
    # reproducible against external double-precision oracles
    # norms are precomputed ONCE PER ROW on each side — Catalyst does
    # not CSE across join rows, so folding them into the pair
    # expression would re-run two O(d) aggregates per (query, corpus)
    # pair; same doubles, ~3x less per-pair compute
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", _norm(F.col("_qv")))
    from methyl_data_pipeline_spark.ext.dedup import _spread

    c = _spread(vectors, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", _norm(F.col("_cv")))
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def md5_planes(n_planes: int, dim: int, salt: str = "pl") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 — the
    same floats are computable in ANY engine (`('0x'||substr(md5(..)
    ,1,15))::BIGINT` in DuckDB), so LSH bucket boundaries are
    bit-reproducible across Spark and external oracles, unlike
    numpy-seeded planes. Components are uniform on [-1, 1] via
    ``(md5_60bit % 2001 - 1000) / 1000``."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{salt}{p}|{i}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: random-hyperplane
    LSH buckets prune the O(n²) pair space to same-bucket pairs, then
    exact cosine confirms (two-stage prune+verify, same shape as the
    MinHash→Jaccard text pipeline in ``ext.dedup``).

    Pair generation goes through ``dedup.bucket_pair_expand`` (the
    same kernel as ``minhash_candidate_pairs`` /
    ``simhash_hamming_pairs``): each sane bucket's ``(id, vec, norm)``
    structs are collected once and pairs expand in-place — ONE shuffle
    of the keyed rows, ONE evaluation of the plane-projection plan,
    ZERO joins, where the self-join shuffled both sides and re-ran the
    O(planes·dim) bucket expression per side. Buckets over
    ``max_bucket`` (e.g. a zero-vector pile-up, which buckets
    constantly) route through the kernel's salted triangle join
    instead of concentrating O(bucket²) in one task; the exact-cosine
    verify runs on the paired struct fields either way. (At toy scale
    AQE turns the old self-join into a broadcast join that is equally
    fast — ~0.6 s vs ~0.85 s at sf0.1 — but a corpus side cannot
    broadcast at scale; the one-shuffle shape is the plan that
    survives 100 TB, so it wins despite the local tie.)

    A vector and its near-duplicate agree on every plane sign with
    probability ≈ 1 - distance/π per plane, so high-threshold near-dups
    are rarely split across buckets. Hyperplanes come from
    :func:`md5_planes` → external oracles reproduce bucket membership
    exactly.
    """
    # pinned input contract (see valid_vector)
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    dim = _first_dim(vectors, vec_col)
    planes = md5_planes(n_planes, dim)
    bucket = _plane_bucket(planes)

    from methyl_data_pipeline_spark.ext.dedup import _spread, bucket_pair_expand

    vec_d = F.col(vec_col).cast("array<double>")
    keyed = _spread(vectors, id_col).select(
        F.col(id_col), vec_d.alias("_v"), bucket(vec_d).alias("_bucket")
    ).withColumn("_nrm", _norm(F.col("_v")))
    # the member struct leads with the id → the kernel's struct
    # ordering emits id_a < id_b without a filter pass
    pairs = bucket_pair_expand(
        keyed,
        ["_bucket"],
        F.struct(
            F.col(id_col).alias("i"),
            F.col("_v").alias("v"),
            F.col("_nrm").alias("n"),
        ),
        max_bucket=max_bucket,
    )
    cos = _dot(F.col("_a.v"), F.col("_b.v")) / (F.col("_a.n") * F.col("_b.n"))
    return (
        pairs.select(
            F.col("_a.i").alias("id_a"),
            F.col("_b.i").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _lloyd_centroids(pts, k: int, seed: int, max_iter: int) -> list[list[float]]:
    """Driver-side Lloyd's iterations over a bounded fit sample, with
    deterministic seeded init (k-means++ light: distinct random picks).
    Empty cells re-seed from the farthest point so k centroids always
    survive. Shared by :func:`ivf_topk` and :func:`semantic_dedup` —
    the coarse quantizer trains FAISS-style on <= ~10k points, so the
    training cost is independent of corpus size."""
    import numpy as np

    rng = np.random.RandomState(seed)
    cents = pts[rng.choice(len(pts), size=min(k, len(pts)), replace=False)]
    for _ in range(max_iter):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = np.array(
            [
                pts[assign == c].mean(axis=0)
                if np.any(assign == c)
                else pts[d2.min(axis=1).argmax()]
                for c in range(len(cents))
            ]
        )
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    return [list(map(float, c)) for c in cents]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    fit_fraction: float = 1.0,
    normalize: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: a seeded
    KMeans coarse quantizer partitions the corpus into ``n_centroids``
    cells; each query exactly reranks only its ``n_probe`` nearest
    cells. ``n_probe == n_centroids`` degrades gracefully to exact
    brute force (asserted in tests) — note the exactness holds for ANY
    quantizer state, so ``max_iter`` is purely a recall/speed knob for
    the partial-probe path (each KMeans iteration is a full corpus
    pass; 8 is plenty for a coarse quantizer).

    Scale shape: the corpus is scanned once to assign cells (broadcast
    centroid literals, JVM-side argmin — no UDF), the search join is
    keyed on the cell id, so each query touches ~``n_probe/n_centroids``
    of the corpus. The quantizer trains FAISS-style on a bounded
    driver-side sample (Lloyd's on ≤``max_fit_rows`` points — a coarse
    quantizer needs enough points per cell, not the corpus): one Spark
    job to collect the sample instead of 2 jobs per MLlib iteration,
    and the training cost is independent of corpus size.
    """
    import numpy as np

    from methyl_data_pipeline_spark.ext.dedup import _spread

    # pinned input contract (see valid_vector) — also keeps the
    # driver-side fit sample rectangular for np.asarray
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    queries = queries.filter(valid_vector(F.col(vec_col)))
    vec_d = F.col(vec_col).cast("array<double>")

    def _maybe_unit(df: DataFrame, col: str) -> DataFrame:
        # cells are assigned by L2 distance while the final ranking is
        # cosine; for unit vectors the two orders coincide, so
        # ``normalize=True`` L2-normalizes corpus/query/fit points and
        # makes the probed cells the right cells for the cosine metric.
        # Off by default: heterogeneous-magnitude corpora should opt in
        # knowingly (cosine VALUES are scale-invariant either way —
        # only cell recall changes).
        if not normalize:
            return df
        n = F.when(F.col("_n0") > 0, F.col("_n0")).otherwise(F.lit(1.0))
        return (
            df.withColumn("_n0", _norm(F.col(col)))
            .withColumn(col, F.transform(F.col(col), lambda x: x / n))
            .drop("_n0")
        )

    corpus = _maybe_unit(
        _spread(vectors, id_col).select(F.col(id_col), vec_d.alias("_v")), "_v"
    )

    # Fit sample comes from the RAW input, not the repartitioned corpus:
    # collecting through the _spread exchange would shuffle the whole
    # corpus just to take the first 10k rows, whereas limit on the
    # parquet scan terminates early (one cheap job).
    max_fit_rows = 10_000
    fit_src = vectors.select(vec_d.alias("_v"))
    if fit_fraction < 1.0:
        fit_src = fit_src.sample(fraction=fit_fraction, seed=seed)
    pts = np.array([r[0] for r in fit_src.limit(max_fit_rows).collect()])
    if pts.size == 0:
        raise ValueError("ivf_topk: empty fit sample — vectors frame has no rows")
    if normalize:
        nrm = np.linalg.norm(pts, axis=1, keepdims=True)
        pts = pts / np.where(nrm > 0, nrm, 1.0)

    centroids = _lloyd_centroids(pts, n_centroids, seed, max_iter)

    # ALL centroid distances in one expression: the centroid matrix
    # ships as a single nested-array literal (one py4j call, one
    # Catalyst node) and the per-centroid loop runs JVM-side inside
    # transform. Building k separate zip_with columns from k×d
    # individual F.lit calls cost ~1s of driver time per compose at
    # k=8, d=64 — pure plan-construction overhead.
    cents_lit = F.lit(centroids)

    def dists_to_all(vc: Column) -> Column:
        return F.transform(
            cents_lit,
            lambda c: F.aggregate(
                F.zip_with(vc, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )

    # cell assignment: argmin over centroid distances, JVM-side
    dists = dists_to_all(F.col("_v"))
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    assigned = corpus.withColumn("_cell", cell)

    # each query probes its n_probe nearest cells: rank the centroid
    # distance array and explode the winning cell ids
    qd = _maybe_unit(
        queries.select(F.col(id_col).alias("query_id"), vec_d.alias("_qv")), "_qv"
    )
    q_dists = dists_to_all(F.col("_qv"))
    probe_cells = F.slice(
        F.expr(
            "transform(array_sort(arrays_zip(_qd, _ci), "
            "(l, r) -> case when l._qd < r._qd then -1 "
            "when l._qd > r._qd then 1 else 0 end), p -> p._ci)"
        ),
        1,
        n_probe,
    )
    probes = (
        qd.withColumn("_qd", q_dists)
        .withColumn("_ci", F.lit(list(range(len(centroids)))))
        .withColumn("_cell", F.explode(probe_cells))
        .select("query_id", "_qv", "_cell")
    )

    pairs = (
        assigned.withColumn("_cn", _norm(F.col("_v")))
        .join(probes.withColumn("_qn", _norm(F.col("_qv"))), "_cell")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn(
            "cosine",
            _dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + exact rerank
    within bucket.

    Hyperplanes are seeded deterministic pseudo-random vectors generated
    once on the driver (tiny: n_planes × dim floats, broadcast as
    literals). Sign pattern = bucket id; the join key is the bucket, so
    a query compares against ~corpus/2^n_planes vectors instead of all.
    Lower recall near bucket boundaries — the standard ANN trade.
    """
    import numpy as np

    # pinned input contract (see valid_vector)
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    queries = queries.filter(valid_vector(F.col(vec_col)))
    dim = _first_dim(vectors, vec_col)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    bucket = _plane_bucket(planes)

    vec_d = F.col(vec_col).cast("array<double>")
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        vec_d.alias("_cv"),
        bucket(vec_d).alias("_bucket"),
    ).withColumn("_cn", _norm(F.col("_cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec_d.alias("_qv"),
        bucket(vec_d).alias("_bucket"),
    ).withColumn("_qn", _norm(F.col("_qv")))
    pairs = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector max-abs integer quantization — the
    embedding STORAGE scale path: at 100 TB of float32 vectors,
    int8 + one float scale per vector quarters the bytes every ANN
    stage has to scan/shuffle, which is usually worth more than any
    plan change.

    Per vector: ``scale = max(|x|) / (2^(bits-1) - 1)``,
    ``q_i = floor(x_i / scale + 0.5)`` — round-half-up via ``floor``,
    deliberately, because it evaluates identically in Spark and DuckDB
    (each engine's native ``round`` disagrees on tie direction across
    types). Output: ``(id, scale DOUBLE, qvec ARRAY<INT>)``; the
    natural formula keeps ``q_i`` in ``[-qmax, qmax]`` (|x|/scale <=
    qmax, and floor(-qmax + 0.5) = -qmax), so no clamp is needed.

    For COSINE work the scale cancels entirely:
    ``cos(s_a*q_a, s_b*q_b) = cos(q_a, q_b)`` — so downstream ranking
    runs on the integer vectors alone and
    :func:`quantization_recall` is a pure function of ``qvec``.

    Entirely JVM-side HOFs. The per-vector ``scale`` aggregate is
    bound as a lambda variable through the transform-over-
    single-element-array idiom — HOF lambdas get NO common-
    subexpression elimination, so referencing the aggregate directly
    inside the per-element lambda would recompute the O(d) max-abs
    scan for every element (O(d^2) per vector).

    Input contract: :func:`valid_vector` (NULL/empty/non-finite/zero
    vectors drop — a zero vector has no scale).
    """
    if not (2 <= bits <= 16):
        raise ValueError("bits must be in [2, 16]")
    qmax = 2 ** (bits - 1) - 1
    valid = valid_vector(F.col(vec_col))
    v = F.col(vec_col).cast("array<double>")
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
        / F.lit(float(qmax))
    )
    # scale > 0 is NOT implied by valid_vector: a subnormal vector
    # (max|x| < qmax * 4.9e-324) has a nonzero component yet its scale
    # UNDERFLOWS to 0.0 in double arithmetic — found by the hypothesis
    # invariant test as a divide-by-zero. Such vectors are
    # unquantizable at this width; they drop like the other invalid
    # shapes (the oracles replay the same clause).
    valid = valid & (scale > 0)
    vectors = vectors.filter(valid)
    # the when(valid, ...) is NOT redundant with the filter above:
    # Catalyst's projection collapse inlines this expression into any
    # DOWNSTREAM filter predicate (e.g. a consumer's valid_vector
    # check), which then evaluates it on PRE-filter rows — where a
    # zero vector gives scale = 0 (ANSI DIVIDE_BY_ZERO) and a NaN
    # component makes the int cast throw. Guarding the expression
    # itself makes it null-out instead of erroring wherever Catalyst
    # chooses to evaluate it; on-contract rows never see the branch.
    qvec = F.when(
        valid,
        F.transform(
            F.array(scale),
            lambda s: F.transform(
                v, lambda x: F.floor(x / s + F.lit(0.5)).cast("int")
            ),
        )[0],
    )
    return vectors.select(
        F.col(id_col),
        scale.alias("scale"),
        qvec.alias("qvec"),
    )


def quantization_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k certificate for :func:`quantize_embeddings`: per query,
    how many of the EXACT float top-k cosine neighbors survive in the
    top-k computed on the quantized integer vectors (scales cancel for
    cosine, so this isolates pure quantization error). The
    decide-before-you-migrate measurement: run it on a sample before
    committing the corpus to int8 storage.

    Output: ``query_id, n_exact, n_overlap, recall_ri`` (recall scaled
    to an integer channel, x1e6) — all hash-stable integers.

    Both top-k passes are :func:`cosine_topk_bruteforce` plans
    (broadcast queries, one corpus scan each, per-query window), so
    the certificate costs exactly two of the baselines it certifies.
    """
    exact = cosine_topk_bruteforce(
        vectors, queries, k=k, id_col=id_col, vec_col=vec_col
    )
    # array<double> BEFORE re-entering the top-k (valid_vector's isnan
    # probe is typed for floating elements; the values stay exact —
    # every |q_i| <= 32767 is double-representable)
    def _q(df: DataFrame) -> DataFrame:
        return quantize_embeddings(
            df, id_col=id_col, vec_col=vec_col, bits=bits
        ).select(id_col, F.col("qvec").cast("array<double>").alias("qvec"))

    approx = cosine_topk_bruteforce(
        _q(vectors), _q(queries), k=k, id_col=id_col, vec_col="qvec"
    )
    hit = approx.select(
        "query_id", F.col("neighbor_id").alias("_hit_id")
    )
    joined = exact.join(
        hit,
        (exact["query_id"] == hit["query_id"])
        & (exact["neighbor_id"] == hit["_hit_id"]),
        "left",
    ).select(exact["query_id"], "neighbor_id", "_hit_id")
    out = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.col("_hit_id").isNotNull().cast("long"))
        .cast("long")
        .alias("n_overlap"),
    )
    return out.withColumn(
        "recall_ri",
        F.round(
            (F.col("n_overlap") / F.col("n_exact") + F.lit(1e-9)) * 1e6
        ).cast("long"),
    )


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension drift report between two embedding snapshots —
    the "did the embedder change under us?" monitor for a continuously
    re-embedded corpus: per dimension, each snapshot's count / mean /
    sample variance and the two-sample z statistic
    ``|mean_new - mean_old| / sqrt(var_old/n_old + var_new/n_new)``.

    Scale shape: ``posexplode`` each snapshot to (dim, value) rows and
    group by dimension — the n x d exploded stream collapses MAP-SIDE
    to d rows per partition (partial aggregation), so the one shuffle
    moves O(d x partitions) rows regardless of corpus size. No
    driver-side vectors, no UDFs.

    Input contract: :func:`valid_vector` on both sides. Dimensions are
    compared positionally; rows shorter than the longest vector simply
    contribute to fewer dims (count is per-dim).
    """
    def moments(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        exploded = df.filter(valid_vector(F.col(vec_col))).select(
            F.posexplode(v).alias("dim", "_x")
        )
        return exploded.groupBy("dim").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.avg("_x").alias(f"mean_{tag}"),
            F.var_samp("_x").alias(f"var_{tag}"),
        )

    joined = moments(old, "old").join(moments(new, "new"), "dim", "full")
    se = F.sqrt(
        F.col("var_old") / F.col("n_old") + F.col("var_new") / F.col("n_new")
    )
    # se == 0 (a constant dimension on both sides) must yield NULL,
    # not an ANSI divide-by-zero; the oracle replays the same CASE
    return joined.withColumn(
        "drift_z",
        F.when(se > 0, F.abs(F.col("mean_new") - F.col("mean_old")) / se),
    )


def md5_centroids(k: int, dim: int, salt: str = "ct") -> list[list[float]]:
    """Deterministic UNIT-NORM pseudo-centroids for oracle-replayable
    coarse quantization: :func:`md5_planes` components normalized to
    the unit sphere in Python, so the SAME double literals embed in
    both the Spark plan and an external SQL oracle.

    Normalization matters for the partition shape, not just parity:
    raw [-1, 1]^dim centroids have |c|^2 spreads larger than the
    per-vector score spread, so argmin_c |v - c|^2 = argmin_c
    (|c|^2 - 2 v.c) degenerates to "everything joins the
    smallest-norm centroid" on a unit-norm corpus. On the sphere,
    assignment reduces to argmax v.c — a balanced Voronoi partition.
    """
    import math

    out = []
    for row in md5_planes(k, dim, salt):
        n = math.sqrt(sum(x * x for x in row)) or 1.0
        out.append([x / n for x in row])
    return out


_COARSE_Q_SCALE = 10**6
_COARSE_LLOYD_ITERS = 4


def _quantize_int(arr):
    """floor(x * 1e6 + 0.5) as int64 — round-half-up in exact double
    arithmetic, chosen over Python/numpy banker's rounding because
    DuckDB's ``FLOOR(x * 1000000.0 + 0.5)`` computes the identical
    value from the identical parquet doubles (the engines' ROUND
    half-rules differ; FLOOR does not)."""
    import numpy as np

    return np.floor(np.asarray(arr, dtype=float) * _COARSE_Q_SCALE + 0.5).astype(
        np.int64
    )


def quantized_lloyd(pts_q, k: int, iters: int = _COARSE_LLOYD_ITERS):
    """Exact-integer Lloyd over quantized points — every step is int64
    arithmetic so an SQL replay (one unrolled CTE block per iteration)
    derives the IDENTICAL centroids from the same sample rows, with no
    float-summation-order hazards:

    - init: the first ``k`` points in input order,
    - assignment: argmin of exact squared L2 (ties to the lowest cell
      index),
    - update: per-dimension ``floor(sum / count)``; empty cells keep
      their previous centroid,
    - fixed ``iters`` rounds, no convergence test (a tolerance check
      would re-introduce float comparisons).

    Magnitude budget: |q| <= ~5e6 per dim after the 1e6 scale, so a
    64-dim squared distance is <= ~6e15 — comfortably inside int64;
    DuckDB's SUM on BIGINT widens to HUGEINT, exact either way.
    """
    import numpy as np

    pts = np.asarray(pts_q, dtype=np.int64)
    k = min(k, len(pts))
    cents = pts[:k].copy()
    for _ in range(iters):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = np.floor_divide(pts[m].sum(axis=0), int(m.sum()))
    return cents


def quantized_kmeans_centroids(
    vectors: DataFrame,
    k: int,
    sample_n: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = _COARSE_LLOYD_ITERS,
) -> list[list[float]]:
    """ENGINE-REPLAYABLE k-means centroids (r12): exact-integer Lloyd
    (:func:`quantized_lloyd`) over the first ``sample_n`` valid
    vectors in ``id_col`` order, returned as floats (q / 1e6). Unlike
    :func:`_lloyd_centroids` (float numpy, seeded init — fine for
    operators whose oracle embeds the result as literals), this fit
    can be recomputed bit-for-bat IN SQL from the same sample rows,
    which is what lets `two_level_fitted`'s oracle derive the whole
    data-adapted plan itself. Measured on the semdedup contract
    fixture: fitted fine centroids raise two_level dup recall 82.4%
    -> 94.7% at probe=1 (97.3% at probe=2) and the exact flat path
    itself finds more true dup verdicts (75 vs 68) — the r11
    conjecture was right at the FINE level, not the coarse. r13
    re-measured at the 10x replica shape (20.5k rows, 320 cells,
    sample_n=1024): fitted 86.3% (probe=1) / 88.7% (probe=2) vs md5
    81.1% / 85.0% — the gains hold at scale shape and compose; see
    the recommended-configuration table in :func:`semantic_dedup`."""
    vecs = vectors.filter(valid_vector(F.col(vec_col)))
    pts = [
        r[0]
        for r in vecs.select(
            F.col(id_col).alias("_sid"),
            F.col(vec_col).cast("array<double>").alias("_sv"),
        )
        .orderBy("_sid")
        .limit(sample_n)
        .select("_sv")
        .collect()
    ]
    if not pts:
        raise ValueError("quantized_kmeans_centroids: no valid rows")
    cq = quantized_lloyd(_quantize_int(pts), k, iters)
    return [[float(v) / _COARSE_Q_SCALE for v in c] for c in cq]


def two_level_plan(
    centroids: list[list[float]],
    seed: int = 42,
    max_iter: int = 8,
    fit_pts=None,
) -> tuple[list[list[float]], list[int]]:
    """Driver-side routing table for the two-level (hierarchical IVF)
    assignment: cluster the ``k`` fine centroids into ~sqrt(k) coarse
    cells (seeded Lloyd over the tiny centroid matrix) and map each
    fine centroid to its owning REMAPPED coarse cell. Coarse cells no
    fine centroid maps to are dropped (an unowned cell would
    inner-join its rows away), with indices remapped densely so
    totality is preserved.

    Extracted from :func:`semantic_dedup` so the oracle builders and
    :func:`two_level_recall` embed the EXACT same coarse-centroid
    literals and ownership the operator routes through — deterministic
    for fixed inputs.

    When ``fit_pts`` is given (a driver-side sample of CORPUS vectors,
    float rows in a deterministic order), the coarse level is
    DATA-ADAPTED (VERDICT r11 #3) instead of clustered over the fine
    centroid points: sample and fine centroids are quantized via
    :func:`_quantize_int` and the coarse centroids come from
    :func:`quantized_lloyd`; ownership is the exact-int argmin of each
    quantized fine centroid over the quantized coarse set (ties to the
    lowest coarse index). Integer arithmetic end-to-end means a DuckDB
    replay derives the identical plan from the same sample rows —
    the property that lets `two_level_adapted`'s oracle recompute the
    plan IN SQL rather than needing data-dependent literals.

    Returns ``(coarse_kept, owner)`` where ``owner[ci]`` is the
    remapped coarse index of fine centroid ``ci``.
    """
    import math

    import numpy as np

    fc = np.asarray(centroids, dtype=float)
    k1 = max(2, int(math.isqrt(len(centroids))))
    if fit_pts is None:
        coarse = _lloyd_centroids(fc, k1, seed, max_iter)
        cc = np.asarray(coarse, dtype=float)
        owner = ((fc[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    else:
        pq = _quantize_int(fit_pts)
        fq = _quantize_int(centroids)
        cq = quantized_lloyd(pq, k1)
        owner = ((fq[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        coarse = [[float(v) / _COARSE_Q_SCALE for v in c] for c in cq]
    owned = sorted(set(int(o) for o in owner))
    coarse_kept = [coarse[i] for i in owned]
    remap = {o: j for j, o in enumerate(owned)}
    return coarse_kept, [remap[int(o)] for o in owner]


def semantic_dedup(
    vectors: DataFrame,
    centroids: list[list[float]] | None = None,
    n_cells: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "far",
    seed: int = 42,
    max_iter: int = 8,
    max_bucket: int = 512,
    assignment: str = "auto",
    coarse_sample: int = 0,
    coarse_probe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): coarse-quantize the embedding space into cells,
    find within-cell cosine near-duplicate pairs above ``threshold``,
    resolve them transitively into clusters, and keep ONE
    representative per cluster.

    Composition of already-certified parts: cell assignment is the IVF
    coarse quantizer (:func:`ivf_topk`'s broadcast-centroid JVM argmin;
    pass ``centroids`` explicitly — e.g. :func:`md5_centroids` — for
    engine-reproducible cells, or leave None for the seeded-KMeans
    fit), pair generation goes through ``dedup.bucket_pair_expand``
    keyed on the cell (bounded join blocks even for a pathological
    mega-cell), and cluster resolution is ``graph.connected_components``
    (min-label propagation). Since every edge is within one cell,
    clusters are cell-local by construction — exactly SemDeDup's
    semantics, where cross-cell near-dups are the accepted recall loss
    that makes the O(n^2) pair space tractable.

    ``keep`` picks the cluster representative:
      - ``"far"`` (default — the paper's policy): the member with the
        LARGEST distance to its cell centroid survives (SemDeDup keeps
        low-density-region examples; ties break to min id),
      - ``"min_id"``: deterministic min id (``dedup_exact``'s winner
        rule),
      - any other string: treated as a COLUMN NAME on ``vectors``;
        the member with the max value survives (``dedup_keep_best``'s
        quality policy; ties to min id).

    Output: (id_col, cell, canonical_id, is_duplicate) for EVERY valid
    input vector — integer/boolean channels only. The keep-list is
    ``filter(~is_duplicate)``.

    100 TB shape: one corpus scan assigns cells; the only corpus-sized
    shuffles are the assignment collapse (``"join"`` path only) and
    the cell-keyed pair expansion, whose cost tracks sum(cell_size^2)
    — at scale ``n_cells`` grows with the corpus (cells of ~10k
    vectors), keeping per-cell work bounded, and the mega-bucket guard
    salts any skewed cell into bounded triangle-join blocks. CC and
    the representative election run over verified near-dup EDGES and
    cluster members only — output-sized, not corpus-sized.

    ``max_bucket`` defaults to 512 here, NOT the text kernels' 4096:
    pair-expansion memory is bucket^2/2 x member size, and a
    64-dim double vector struct is ~600 B where a minhash member is
    tens of bytes — at 4096 one oversized cell's in-place pair array
    is ~5 GB in a single task (measured OOM on a skew-concentrated
    probe corpus), at 512 it is ~80 MB, and genuinely skewed cells
    stream through the kernel's salted triangle join instead.

    ``assignment`` picks the argmin implementation (identical doubles
    and tie rule either way — same fold, same (dist, idx) ordering):
      - ``"transform"``: all k distances in ONE Catalyst transform
        over a broadcast centroid literal — zero joins, zero extra
        shuffles, but materializes a k-array per row; the winner for
        small k.
      - ``"join"``: broadcast-join the corpus against a k-row centroid
        frame and collapse with min(struct(dist, idx)) — the n x k
        intermediate never materializes per-row arrays and partial
        aggregation collapses it map-side, so the shuffle is n rows;
        the shape that survives k in the thousands (measured: at
        k=3200 the transform path allocates ~k x 16 B per row and
        GC-stalls, the join path streams).
      - ``"auto"`` (default): ``"transform"`` for k <= 256 else
        ``"join"``.
      - ``"two_level"`` (explicit opt-in — an APPROXIMATION, like
        every hierarchical IVF): the flat paths cost O(n * k * d)
        flops, which at k in the thousands dominates everything else
        (measured: k=3200 over 200k rows ≈ 45 min of fold evaluation
        where the whole 10x probe ran in 32 s). Here the k fine
        centroids are themselves clustered into ~sqrt(k) coarse cells
        (driver-side numpy over the centroid matrix — tiny); each row
        is assigned to its coarse cell via the transform path, then
        refined ONLY among that cell's fine centroids via the join
        path — O(n * 2*sqrt(k) * d). A row whose true nearest fine
        centroid lives under a different coarse cell gets its
        second-best; that is the standard IVF recall trade, and for
        SemDeDup it only moves which CELL a vector dedups within.
        Deterministic for fixed inputs.

    RECOMMENDED two_level configuration (r13, VERDICT r12 #3 — decided
    on measurement, both scales): pass DATA-FITTED fine centroids
    (:func:`quantized_kmeans_centroids`) rather than
    :func:`md5_centroids`, and ``coarse_probe=2`` when the recall
    target is >90%. Measured dup recall of the two_level path vs the
    exact flat baseline on the planted-dup fixtures:

    ===================  ==========  ============
    config               sf0.01      10x replica
    ===================  ==========  ============
    md5, probe=1         82.4%       81.1%
    md5, probe=2         92.6%       85.0%
    fitted, probe=1      94.7%       86.3%
    fitted, probe=2      97.3%       88.7%
    ===================  ==========  ============

    Crossover rule: fitting the fine centroids is ~free at query time
    (the integer-Lloyd fit runs once over a bounded ordered sample)
    and dominates md5 at every measured point — always prefer it when
    centroids are not externally supplied. ``coarse_probe=2`` costs
    probe-x fan-out on the COARSE routing stage only (refinement work
    is unchanged; measured wall moved <10%) and buys +2.3-2.6pt on
    fitted centroids — raise it before raising k when recall is
    short. ``md5_centroids`` remains the right choice only when the
    oracle/test needs centroids derivable with NO corpus pass.
    """
    from methyl_data_pipeline_spark.ext.dedup import _spread, bucket_pair_expand
    from methyl_data_pipeline_spark.ext.graph import connected_components

    quality_col = None
    if keep not in ("far", "min_id"):
        quality_col = keep
        if quality_col not in vectors.columns:
            raise ValueError(
                f"semantic_dedup: keep={keep!r} is neither a policy nor "
                "a column of the vectors frame"
            )

    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    if centroids is None:
        import numpy as np

        # orderBy before limit (ADVICE r10): a bare .limit() samples
        # whatever partitions enumerate first, so the fitted centroids
        # (hence cell assignment) would depend on physical file layout.
        # Ordered top-k plans as TakeOrderedAndProject — per-partition
        # heaps, no single-task funnel — and makes the centroids=None
        # path deterministic for any layout of the same rows.
        pts = np.array(
            [
                r[0]
                for r in vectors.select(
                    F.col(id_col).alias("_sid"),
                    F.col(vec_col).cast("array<double>").alias("_sv"),
                )
                .orderBy("_sid")
                .limit(10_000)
                .select("_sv")
                .collect()
            ]
        )
        if pts.size == 0:
            raise ValueError("semantic_dedup: vectors frame has no valid rows")
        centroids = _lloyd_centroids(pts, n_cells, seed, max_iter)

    if assignment == "auto":
        assignment = "transform" if len(centroids) <= 256 else "join"
    if assignment not in ("transform", "join", "two_level"):
        raise ValueError(f"semantic_dedup: unknown assignment {assignment!r}")
    if assignment != "two_level" and (coarse_probe > 1 or coarse_sample > 0):
        # ADVICE r12: these knobs only shape the two_level hierarchy;
        # silently ignoring them (e.g. under assignment="auto"
        # resolving to transform/join) would let a caller tune recall
        # with no effect and no signal.
        raise ValueError(
            "semantic_dedup: coarse_probe/coarse_sample apply only to "
            f"assignment='two_level' (resolved assignment: {assignment!r})"
        )

    vec_d = F.col(vec_col).cast("array<double>")
    base_cols = [F.col(id_col), vec_d.alias("_v")]
    if quality_col is not None:
        base_cols.append(F.col(quality_col).alias("_q"))
    carry = ["_q"] if quality_col is not None else []

    def transform_argmin(cents: list[list[float]]) -> Column:
        """min (dist, idx) struct over a broadcast centroid literal —
        ONE evaluation of the k x d distance transform (array_min over
        (d, i) structs; no CSE across projections otherwise). First-
        occurrence index on ties via struct ordering."""
        dists = F.transform(
            F.lit(cents),
            lambda c: F.aggregate(
                F.zip_with(vec_d, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return F.array_min(
            F.arrays_zip(dists.alias("d"), F.lit(list(range(len(cents)))).alias("i"))
        )

    def join_refine(rows: DataFrame, cent_df: DataFrame, on) -> DataFrame:
        """Broadcast-join rows against a centroid frame and collapse
        with min(struct(d, i)) — same doubles and tie rule as the
        transform path; partial aggregation collapses each vector's
        candidate rows map-side, so the ONE shuffle moves n rows."""
        d = F.aggregate(
            F.zip_with(F.col("_v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = rows.join(F.broadcast(cent_df), on) if on is not None else (
            rows.join(F.broadcast(cent_df))
        )
        scored = scored.select(
            id_col,
            "_v",
            *carry,
            F.struct(d.alias("d"), F.col("ci").alias("i")).alias("_mi"),
        )
        return scored.groupBy(id_col).agg(
            F.min("_mi").alias("_m"),
            F.first("_v").alias("_v"),
            *[F.first(c).alias(c) for c in carry],
        )

    spark = vectors.sparkSession
    if assignment == "transform":
        assigned = _spread(vectors, id_col).select(
            *base_cols, transform_argmin(centroids).alias("_m")
        )
    elif assignment == "join":
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "ci int, cv array<double>",
        )
        assigned = join_refine(
            _spread(vectors, id_col).select(*base_cols), cent_df, None
        )
    else:  # two_level
        fit_pts = None
        if coarse_sample > 0:
            # data-adapted coarse level (VERDICT r11 #3): ordered
            # deterministic sample of the (validity-filtered) corpus —
            # orderBy before limit for layout independence, same
            # reasoning as the centroids=None fit above. The sample is
            # quantized inside two_level_plan so the coarse fit is
            # exact-integer and oracle-replayable.
            fit_pts = [
                r[0]
                for r in vectors.select(
                    F.col(id_col).alias("_sid"), vec_d.alias("_sv")
                )
                .orderBy("_sid")
                .limit(coarse_sample)
                .select("_sv")
                .collect()
            ]
            if not fit_pts:
                raise ValueError(
                    "semantic_dedup: coarse_sample > 0 but no valid rows"
                )
        coarse_kept, owner = two_level_plan(
            centroids, seed, max_iter, fit_pts=fit_pts
        )
        cent_df = spark.createDataFrame(
            [
                (int(ci), c, int(o))
                for ci, (c, o) in enumerate(zip(centroids, owner))
            ],
            "ci int, cv array<double>, owner int",
        )
        if coarse_probe <= 1:
            rows = _spread(vectors, id_col).select(
                *base_cols,
                transform_argmin(coarse_kept).getField("i").alias("_c1"),
            )
        else:
            # multi-probe routing (IVF nprobe): each row refines over
            # the fine centroids owned by its `coarse_probe` NEAREST
            # coarse cells — recall approaches the flat path as probe
            # grows, at probe x refine cost. join_refine's groupBy
            # collapses the probe fan-out back to one row per vector.
            cd = F.transform(
                F.lit(coarse_kept),
                lambda c: F.aggregate(
                    F.zip_with(vec_d, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            )
            probes = F.slice(
                F.transform(
                    F.array_sort(
                        F.arrays_zip(
                            cd.alias("d"),
                            F.lit(list(range(len(coarse_kept)))).alias("i"),
                        )
                    ),
                    lambda p: p["i"],
                ),
                1,
                coarse_probe,
            )
            rows = _spread(vectors, id_col).select(
                *base_cols, F.explode(probes).alias("_c1")
            )
        assigned = join_refine(rows, cent_df, F.col("_c1") == F.col("owner"))

    # Persisted (cache.track, released by the harness after the
    # dependent action): ``keyed`` is consumed by BOTH the pair
    # expansion (whose small/big branches each re-evaluate their
    # upstream) and the members election below — without it the
    # O(n*k*d) assignment fold above runs three times per call
    # (guide §2.4/§5; measured r14: semantic_dedup 19 -> 12 jobs,
    # two_level_recall 38 -> 25 jobs, wall ~0.6x). The cached rows are
    # (id, vec, cell, dist, nrm) — corpus-sized but spillable, the
    # same recompute-vs-store trade bucket_pair_expand's "sized" mode
    # documents for SimHash.
    from methyl_data_pipeline_spark import cache as _cache

    keyed = _cache.track(
        assigned.select(
            id_col,
            "_v",
            F.col("_m.i").cast("int").alias("_cell"),
            F.col("_m.d").alias("_dist"),
            *carry,
        ).withColumn("_nrm", _norm(F.col("_v")))
    )

    pairs = bucket_pair_expand(
        keyed,
        ["_cell"],
        F.struct(
            F.col(id_col).alias("i"),
            F.col("_v").alias("v"),
            F.col("_nrm").alias("n"),
        ),
        max_bucket=max_bucket,
    )
    cos = _dot(F.col("_a.v"), F.col("_b.v")) / (F.col("_a.n") * F.col("_b.n"))
    edges = pairs.select(
        F.col("_a.i").alias("id_a"), F.col("_b.i").alias("id_b"), cos.alias("_c")
    ).filter(F.col("_c") >= threshold)

    comp = connected_components(edges, "id_a", "id_b")
    member_cols = [id_col, "_cell", "_dist"] + (
        ["_q"] if quality_col is not None else []
    )
    members = (
        keyed.select(*member_cols)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("_comp", F.coalesce("component", F.col(id_col)))
    )
    if keep == "min_id":
        rep = F.col("_comp")
        out = members.select(
            id_col,
            F.col("_cell").alias("cell"),
            rep.alias("canonical_id"),
            (rep != F.col(id_col)).alias("is_duplicate"),
        )
    else:
        order = (
            [F.col("_q").desc_nulls_last(), F.col(id_col).asc()]
            if quality_col is not None
            else [F.col("_dist").desc(), F.col(id_col).asc()]
        )
        w = Window.partitionBy("_comp").orderBy(*order)
        # the window shuffles cluster MEMBERS only (singletons ride
        # along as 1-row partitions keyed by their own id); min_by
        # over a groupBy would need a second join back — same shuffle
        # count, more code
        ranked = members.withColumn(
            "_rep",
            F.first(F.col(id_col)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        out = ranked.select(
            id_col,
            F.col("_cell").alias("cell"),
            F.col("_rep").alias("canonical_id"),
            (F.col("_rep") != F.col(id_col)).alias("is_duplicate"),
        )
    return out


def two_level_recall(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    max_bucket: int = 512,
    coarse_sample: int = 0,
    coarse_probe: int = 1,
) -> DataFrame:
    """Recall certificate for ``semantic_dedup(assignment="two_level")``
    — quantifies the hierarchical-IVF approximation the way
    :func:`quantization_recall` quantifies int8 loss: run BOTH paths on
    a bounded sample and measure, at the outcome level, what the
    two-level routing costs.

    One summary row:

    - ``n_vectors`` / ``n_cell_moved`` / ``cell_agree_ri`` — how many
      vectors land in a different fine cell than the exact flat argmin
      (the only mechanism by which two_level can lose a near-dup pair).
    - ``n_dups_flat`` / ``n_dups_kept`` / ``dup_recall_ri`` — of the
      vectors the exact path marks ``is_duplicate``, the fraction the
      two_level path still marks (NULL when the flat path finds no
      duplicates — certify on a fixture with planted dups).

    Costs two full ``semantic_dedup`` runs of the sample it certifies —
    the same two-baselines price ``quantization_recall`` pays. All
    output channels are hash-stable integers.
    """
    kw = dict(
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        keep="far",
        seed=seed,
        max_iter=max_iter,
        max_bucket=max_bucket,
    )
    # baseline pinned EXPLICITLY to the exact flat forms (ADVICE r11):
    # "auto" resolves to these today, but if auto ever gained a
    # two_level arm the certificate would compare two_level to itself
    # and report perfect recall.
    flat_form = "transform" if len(centroids) <= 256 else "join"
    flat = semantic_dedup(vectors, centroids, assignment=flat_form, **kw)
    tl = semantic_dedup(
        vectors,
        centroids,
        assignment="two_level",
        coarse_sample=coarse_sample,
        coarse_probe=coarse_probe,
        **kw,
    )
    f = flat.select(
        F.col(id_col).alias("_id"),
        F.col("cell").alias("_cf"),
        F.col("is_duplicate").alias("_df"),
    )
    t = tl.select(
        F.col(id_col).alias("_id"),
        F.col("cell").alias("_ct"),
        F.col("is_duplicate").alias("_dt"),
    )
    agg = f.join(t, "_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum((F.col("_cf") != F.col("_ct")).cast("long"))
        .cast("long")
        .alias("n_cell_moved"),
        F.sum(F.col("_df").cast("long")).cast("long").alias("n_dups_flat"),
        F.sum((F.col("_df") & F.col("_dt")).cast("long"))
        .cast("long")
        .alias("n_dups_kept"),
    )
    return agg.select(
        "*",
        F.round(
            (
                (F.col("n_vectors") - F.col("n_cell_moved"))
                / F.col("n_vectors")
                + F.lit(1e-9)
            )
            * 1e6
        )
        .cast("long")
        .alias("cell_agree_ri"),
        F.when(
            F.col("n_dups_flat") > 0,
            F.round(
                (F.col("n_dups_kept") / F.col("n_dups_flat") + F.lit(1e-9))
                * 1e6
            ).cast("long"),
        ).alias("dup_recall_ri"),
    )
