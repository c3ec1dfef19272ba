"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k -- broadcast the (small) query set
against the candidate corpus; per-row dot product is a pure array
expression (``zip_with`` + ``aggregate``), fully codegen'd, no Python.
The scan side streams: at 100 TB this is one pass, no shuffle until the
final per-query top-k (a TakeOrdered over k*|queries| rows).

Scale path: random-hyperplane LSH buckets (sign-bit signatures) restrict
candidates to matching buckets; multi-probe = compare against neighboring
buckets by flipping one bit.  An IVF-style variant (k-means coarse
quantizer) is expressible the same way: assign to nearest centroid
(broadcast centroids), shuffle only on centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, left-to-right summation
    (deterministic, matches DuckDB's list_dot_product ordering)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _dbl(x: float) -> str:
    """Exact SQL double literal: scientific notation with 17 significant
    digits round-trips every IEEE double bit-for-bit, and Spark parses
    exponent literals as DOUBLE (not DECIMAL)."""
    return f"{float(x):.17E}"


def _dot_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot_expr` over named columns -- the identical
    left-to-right zip_with/aggregate fold, one JVM parse instead of the
    HOF builder's dozens of py4j round trips (r15, guide SS5)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    """SQL text of :func:`norm_expr` over a named column."""
    return f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + (x * x)))"


def sign_bucket(
    vec: "Column | str", planes: list[list[float]]
) -> Column:
    """LSH bucket id from the sign bits of dot products with fixed random
    hyperplanes (hyperplanes are literals -> broadcast for free).

    Pass the COLUMN NAME (r15 fast path) to build the whole bucket
    expression as one SQL string: the Column form issued ~400 py4j round
    trips per call (64 literals x 6 planes plus the HOF builders),
    ~0.4 s of pure driver latency per build on this host, for the
    identical expression tree."""
    if isinstance(vec, str):
        terms = []
        for i, plane in enumerate(planes):
            arr = "array(" + ", ".join(_dbl(x) for x in plane) + ")"
            terms.append(
                f"(CASE WHEN {_dot_sql(vec, arr)} >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        return F.expr(" + ".join(terms))
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot_expr(vec, lit_plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def random_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    carry_col: str | None = None,
    exclude: str = "id",
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, cand_id, cosine, rank).

    The query side is explicitly broadcast; ranking rounds the cosine (to
    make rank deterministic across float summation orders) and tie-breaks
    on candidate id.

    ``carry_col`` carries an extra column through both sides as
    ``query_<carry_col>`` / ``cand_<carry_col>``.  ``exclude`` picks the
    pair filter: ``"id"`` drops self-pairs (nearest-neighbor search);
    ``"carry"`` keeps only pairs whose carried values DIFFER
    (hard-negative mining -- requires ``carry_col``).
    """
    # Norms are precomputed per ROW, not per pair: higher-order array
    # expressions run interpreted (outside codegen), so the naive
    # cosine-per-pair recomputes two O(dim) folds |Q|x|C| times.  With
    # per-row norms only the dot product remains in the pair loop -- 3x
    # fewer lambda evaluations, same exact arithmetic (identical folds, so
    # the DuckDB oracle still matches bit-for-bit before rounding).
    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ]
    c_cols = [
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ]
    carried: list[str] = []
    if carry_col is not None:
        q_cols.append(F.col(carry_col).alias(f"query_{carry_col}"))
        c_cols.append(F.col(carry_col).alias(f"cand_{carry_col}"))
        carried = [f"query_{carry_col}", f"cand_{carry_col}"]
    q = queries.select(*q_cols).withColumn("qn", F.expr(_norm_sql("qv")))
    c = candidates.select(*c_cols).withColumn("cn", F.expr(_norm_sql("cv")))
    cos = F.expr(f"{_dot_sql('qv', 'cv')} / (qn * cn)")
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    if exclude not in ("id", "carry"):
        raise ValueError(
            f"exclude must be 'id' or 'carry', got {exclude!r}"
        )
    if exclude == "carry":
        if carry_col is None:
            raise ValueError("exclude='carry' requires carry_col")
        pair_filter = F.col(f"query_{carry_col}") != F.col(
            f"cand_{carry_col}"
        )
    else:
        pair_filter = F.col("query_id") != F.col("cand_id")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(pair_filter)
        .select("query_id", "cand_id", *carried, cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    round_digits: int | None = 6,
    max_train: int = 100_000,
) -> DataFrame:
    """IVF-style approximate top-k: k-means coarse quantizer (pyspark.ml
    KMeans), corpus assigned to its nearest centroid, queries probe the
    ``n_probe`` nearest cells; exact cosine re-ranks inside the probed
    cells.

    Scale shape: training samples at most ``max_train`` vectors (centroid
    quality needs a sample, not the corpus); assignment is one broadcast
    model.transform pass over the corpus; the search join shuffles on
    centroid id only, touching ~n_probe/n_centroids of the corpus per
    query.  The probe list is built by crossing the (tiny, broadcast)
    query set with the (tiny, literal) centroid table -- |Q| x n_centroids
    rows, never the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", F.expr(_norm_sql("cv")))

    featurized = c.withColumn("features", array_to_vector("cv"))
    train = featurized.select("features").limit(max_train)
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(train)
    assigned = (
        model.transform(featurized)
        .withColumnRenamed("prediction", "bucket")
        .drop("features")
    )

    spark = queries.sparkSession
    centers = [
        (i, [float(x) for x in ctr])
        for i, ctr in enumerate(model.clusterCenters())
    ]
    centers_df = spark.createDataFrame(
        centers, "bucket int, centroid array<double>"
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", F.expr(_norm_sql("qv")))
    sq_dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("bucket"))
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("dist", sq_dist)
        .withColumn("probe_rank", F.row_number().over(wq))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qv", "qn", "bucket")
    )

    cos = F.expr(f"{_dot_sql('qv', 'cv')} / (qn * cn)")
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        assigned.join(F.broadcast(probes), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    round_digits: int | None = 6,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    hyperplane sign bucket.  Trades recall for a |corpus|/2^planes
    reduction in comparisons; exact cosine re-ranks within the bucket.

    ``multi_probe`` additionally probes every bucket at Hamming distance 1
    from the query's (flip one sign bit): near neighbors that straddle a
    single hyperplane are recovered at (planes+1)x probe cost, still a
    2^planes/(planes+1) work reduction.  Only the (tiny, broadcast) query
    side expands -- the corpus is still bucketed once.
    """
    planes = random_planes(num_planes, dim, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", sign_bucket("qv", planes)).withColumn(
        "qn", F.expr(_norm_sql("qv"))
    )
    probe_xors = [0] + ([1 << i for i in range(num_planes)] if multi_probe else [])
    q = q.withColumn(
        "bucket",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(x)) for x in probe_xors])
        ),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", sign_bucket("cv", planes)).withColumn(
        "cn", F.expr(_norm_sql("cv"))
    )
    cos = F.expr(f"{_dot_sql('qv', 'cv')} / (qn * cn)")
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    max_train: int = 100_000,
    max_iter: int = 20,
) -> DataFrame:
    """Train product-quantization codebooks: split each vector into ``m``
    subvectors and fit a ``2**nbits``-centroid k-means per subspace on a
    bounded sample.  Returns the codebook frame
    (sub_id, code, centroid array<double>) -- ``m * 2**nbits`` rows, tiny
    by construction, meant to be broadcast everywhere downstream.

    Scale shape: training reads at most ``max_train`` vectors -- codebook
    quality needs a SAMPLE, not the corpus (the same posture as
    ``ivf_topk``, and how faiss trains PQ in practice).  The bounded
    sample is pulled to the driver once and the m Lloyd's fits run
    vectorized in numpy there: for the largest sane configuration
    (100k x 128 floats) that is ~50 MB and milliseconds per iteration,
    where m sequential pyspark.ml fits would pay 10s of seconds of
    per-iteration job overhead for identical centroids.  Deterministic:
    seeded init (distinct sample rows), fixed iteration count, empty
    clusters keep their previous centroid.
    """
    rows = _pq_train_rows(df, vec_col, m, nbits, seed, max_train, max_iter)
    return df.sparkSession.createDataFrame(
        rows, "sub_id int, code int, centroid array<double>"
    )


def _pq_train_rows(
    df: DataFrame,
    vec_col: str,
    m: int,
    nbits: int,
    seed: int,
    max_train: int,
    max_iter: int,
) -> list[tuple]:
    """The codebook rows behind :func:`pq_train_codebooks`, pre-frame:
    (sub_id, code, centroid) tuples in (sub_id asc, code asc) order.
    Callers that also need the centers as numpy (the encode kernels)
    build both views from this one list instead of collecting the
    DataFrame back off the JVM (r15: that collect was a full scheduled
    job per encode, pure round-trip overhead on rows the driver itself
    just trained)."""
    k = 1 << nbits
    X = _collect_sample(df, vec_col, max_train)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim ({dim}) must divide evenly into m ({m})")
    sub = dim // m
    rows = []
    for j in range(m):
        centers = _lloyd(X[:, j * sub : (j + 1) * sub], k, seed + j, max_iter)
        for code, ctr in enumerate(centers):
            rows.append((j, code, [float(x) for x in ctr]))
    return rows


def _rows_to_centers(rows: list[tuple]):
    """(m, k, sub) numpy centers from codebook rows -- the same array the
    encode kernels' ``codebooks.collect()`` path builds (rows are already
    (sub_id asc, code asc); float64 round-trips parquet/py4j exactly, so
    either construction is bit-identical)."""
    import numpy as np

    m = max(r[0] for r in rows) + 1
    return np.array([[r[2] for r in rows if r[0] == j] for j in range(m)])


def _collect_sample(df: DataFrame, vec_col: str, max_train: int):
    """Bounded training sample as a numpy matrix (the training-sample
    contract: at most ``max_train`` rows reach the driver)."""
    import numpy as np

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(max_train)
        .collect()
    )
    return np.array([r["v"] for r in rows])


def _lloyd(X, k: int, seed: int, iters: int):
    """Seeded vectorized Lloyd's k-means (deterministic: distinct-row
    init, fixed iteration count, empty clusters keep their centroid)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(centers)):
            members = X[assign == c]
            if len(members):
                centers[c] = members.mean(0)
    return centers


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    pq_centers=None,
) -> DataFrame:
    """Encode each vector to ``m`` PQ codes: one (id, sub_id, code) row
    per subvector, code = argmin squared distance to that subspace's
    centroids.

    Scale shape: MAP-ONLY, Arrow-batched.  The codebook is bounded by
    construction (m * 2**nbits rows), so it is pulled to the driver once
    and shipped into a ``mapInPandas`` kernel where each Arrow batch is
    one vectorized numpy argmin over all subspaces at once -- no join,
    no shuffle, no aggregation, and the encode parallelizes with the
    scan (which is what lets the same pass run per micro-batch in the
    streaming twin).  This is the deliberate Pandas-seam exception to
    the JVM-first rule: a dense fixed-dim numeric kernel where the
    JVM-side alternatives measured far slower (interpreted
    zip_with/aggregate folds ~5 s, a fully-unrolled scalar codegen tree
    ~60 s, this ~1 s on the same 50k x 64-dim input -- the multimodal
    decode seam precedent).  numpy argmin takes the FIRST minimum, so
    ties break to the lowest code deterministically.  At 4 bits per
    code the encoded corpus is ~64x smaller than float32 vectors -- the
    memory economics that let a 100 TB corpus fit an in-RAM ANN index.
    """
    import numpy as np
    import pandas as pd

    if pq_centers is not None:
        # r15: trainers that just built the codebook rows driver-side
        # pass the centers directly -- skipping a scheduled collect job
        # whose only purpose was round-tripping 128 rows off the JVM
        centers = np.asarray(pq_centers, dtype=np.float64)
    else:
        books: dict[int, dict[int, list[float]]] = {}
        for r in codebooks.collect():  # bounded: m * 2**nbits rows
            books.setdefault(r["sub_id"], {})[r["code"]] = [
                float(x) for x in r["centroid"]
            ]
        centers = np.array(
            [[books[j][c] for c in sorted(books[j])] for j in sorted(books)]
        )  # (m, k, sub)
    n_sub, _, sub_len = centers.shape

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Xs = X.reshape(len(pdf), n_sub, sub_len)
            # (n, m, k) squared distances, argmin over k
            d = ((Xs[:, :, None, :] - centers[None, :, :, :]) ** 2).sum(-1)
            codes = d.argmin(2).astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_sub),
                    "sub_id": np.tile(
                        np.arange(n_sub, dtype="int32"), len(pdf)
                    ),
                    "code": codes.reshape(-1),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(
        encode, f"{id_col} {id_type}, sub_id int, code int"
    )


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    round_digits: int | None = 6,
    max_train: int = 100_000,
    max_iter: int = 20,
    rerank: int | None = None,
) -> DataFrame:
    """Approximate nearest neighbors by PQ asymmetric distance (ADC):
    candidates are stored only as m codes; each query precomputes its
    distance to every centroid of every subspace (the ADC table --
    |Q| * m * 2**nbits rows, tiny, broadcast), and a candidate's distance
    is the SUM of m table lookups, never a d-dimensional float op.

    ``rerank=R`` enables the standard two-stage search: ADC shortlists
    the top ``k*R`` per query, then ONLY those candidates' float vectors
    are fetched (broadcast shortlist against the corpus -- one pass, no
    corpus shuffle) and exact L2 re-ranks to the final k.  Quantization
    error then only costs recall when a true neighbor falls outside the
    shortlist, so modest R recovers most of it -- the memory economics of
    codes with near-exact final ordering.

    Scale shape: the corpus-proportional work is one encode pass (see
    ``pq_encode``) plus a broadcast join of the code rows against the ADC
    table on (sub_id, code) and a (query, candidate)-keyed sum with
    map-side combine.  Returns (query_id, cand_id, pq_dist, rank) --
    with rerank, pq_dist is the EXACT L2 distance of the re-ranked pair
    -- ascending distance, cand_id tie-break.  Recall-vs-brute-force is
    asserted in tests (rows-only key: k-means centroids are not
    SQL-expressible).
    """
    book_rows = _pq_train_rows(
        candidates, vec_col, m, nbits, seed, max_train, max_iter
    )
    codebooks = candidates.sparkSession.createDataFrame(
        book_rows, "sub_id int, code int, centroid array<double>"
    )
    codes = pq_encode(
        candidates, codebooks, id_col, vec_col, m=m,
        pq_centers=_rows_to_centers(book_rows),
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    sub_expr = (F.size(F.col("qv")) / F.lit(m)).cast("int")
    q_sub = q.join(
        F.broadcast(codebooks.select("sub_id").distinct())
    ).select(
        "query_id",
        "sub_id",
        F.slice(
            F.col("qv"), F.col("sub_id") * sub_expr + 1, sub_expr
        ).alias("sv"),
    )
    sq_dist = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    adc = q_sub.join(F.broadcast(codebooks), "sub_id").select(
        "query_id", "sub_id", "code", sq_dist.alias("d2")
    )

    dist = (
        codes.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(adc), ["sub_id", "code"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum("d2").alias("pq_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("cand_id")
    )
    if rerank is not None:
        shortlist = (
            dist.withColumn("adc_rank", F.row_number().over(w))
            .filter(F.col("adc_rank") <= k * rerank)
            .select("query_id", "cand_id")
        )
        cv = candidates.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        qv = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        exact_d2 = F.aggregate(
            F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dist = (
            cv.join(F.broadcast(shortlist), "cand_id")
            .join(F.broadcast(qv), "query_id")
            .select("query_id", "cand_id", exact_d2.alias("pq_dist"))
        )
    if round_digits is not None:
        dist = dist.withColumn("pq_dist", F.round("pq_dist", round_digits))
    return dist.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_encode(
    df: DataFrame,
    coarse_centers,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_centers=None,
) -> DataFrame:
    """Fused IVF-PQ index build: one Arrow pass assigns each vector to
    its nearest coarse cell AND PQ-encodes the RESIDUAL (vector minus
    cell center) -- the faiss IVF-PQ layout, where residual quantization
    spends the codebook's resolution on the within-cell remainder
    instead of re-describing the cell position.

    Returns long-form (id, cell, sub_id, code).  MAP-ONLY: both the
    coarse centers (``n_centroids x dim`` numpy array) and the residual
    codebooks (m * 2**nbits rows) are driver-bounded and shipped into
    the kernel; no join, no shuffle -- the index build parallelizes with
    the scan and runs per micro-batch in a streaming twin unchanged.
    """
    import numpy as np
    import pandas as pd

    if pq_centers is not None:
        # r15: the build path passes its freshly-trained centers straight
        # through instead of collecting the codebook frame back off the
        # JVM (one whole scheduled job saved per build)
        pq_centers = np.asarray(pq_centers, dtype=np.float64)
    else:
        books: dict[int, dict[int, list[float]]] = {}
        for r in codebooks.collect():  # bounded: m * 2**nbits rows
            books.setdefault(r["sub_id"], {})[r["code"]] = [
                float(x) for x in r["centroid"]
            ]
        pq_centers = np.array(
            [[books[j][c] for c in sorted(books[j])] for j in sorted(books)]
        )  # (m, k, sub)
    coarse = np.asarray(coarse_centers, dtype=np.float64)
    n_sub, _, sub_len = pq_centers.shape

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cell_d = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(-1)
            cells = cell_d.argmin(1)
            resid = X - coarse[cells]
            Rs = resid.reshape(len(pdf), n_sub, sub_len)
            d = ((Rs[:, :, None, :] - pq_centers[None, :, :, :]) ** 2).sum(-1)
            codes = d.argmin(2).astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_sub),
                    "cell": cells.astype("int32").repeat(n_sub),
                    "sub_id": np.tile(
                        np.arange(n_sub, dtype="int32"), len(pdf)
                    ),
                    "code": codes.reshape(-1),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(
        encode, f"{id_col} {id_type}, cell int, sub_id int, code int"
    )


class IvfPqIndex:
    """A built IVF-PQ index: the faiss build/search separation.

    Holds the coarse quantizer (``coarse``: n_centroids x dim numpy),
    the residual PQ codebooks (``pq_centers``: (m, k, sub) numpy +
    the equivalent ``codebooks`` DataFrame), and the encoded corpus
    (``codes``: the long-form (id, cell, sub_id, code) DataFrame,
    persisted when built with ``persist=True``).  Production posture:
    the corpus pass runs ONCE at build time; searches only read the
    codes -- ``q_ann_ivfpq_search`` benches exactly that, and the
    streaming PQ twin proves the frozen-codebook contract per batch.
    """

    def __init__(
        self, coarse, pq_centers, codebooks: DataFrame, codes: DataFrame,
        id_col: str, vec_col: str, m: int,
    ):
        self.coarse = coarse
        self.pq_centers = pq_centers
        self.codebooks = codebooks
        self.codes = codes
        self.id_col = id_col
        self.vec_col = vec_col
        self.m = m
        # set by load(): the storage path self.codes lazily scans.  save()
        # refuses to overwrite it -- Spark cannot atomically overwrite a
        # parquet location it is concurrently reading in the same job, so
        # a load-then-resave-in-place would corrupt the index (ADVICE r7).
        self._source_path: str | None = None

    def unpersist(self) -> None:
        self.codes.unpersist()

    def save(self, path: str) -> None:
        """Persist the index to storage (the faiss ``write_index``
        analog): codes + codebooks + coarse centroids + meta, each a
        parquet table under ``path``, so a 100 TB corpus is encoded once
        and searched from ANY later session.  Everything goes through
        Spark writers -- no driver-local filesystem assumptions, so the
        path can be HDFS/S3/local alike.  The corpus-proportional part
        (``codes``) writes distributed; coarse/codebooks/meta are
        KB-sized."""
        import numpy as np

        if (
            self._source_path is not None
            and path.rstrip("/") == self._source_path.rstrip("/")
        ):
            raise ValueError(
                f"IvfPqIndex loaded from {self._source_path!r} cannot be "
                "re-saved onto its own source path: the codes DataFrame "
                "is a lazy scan of that location and Spark would read "
                "and overwrite the same files in one job.  Save to a new "
                "path (then swap), or rebuild the index from vectors."
            )
        spark = self.codes.sparkSession
        # exactly-once overwrite semantics: a re-save replaces the index
        self.codes.write.mode("overwrite").parquet(f"{path}/codes")
        self.codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
        coarse_rows = [
            (int(c), [float(x) for x in row])
            for c, row in enumerate(np.asarray(self.coarse))
        ]
        spark.createDataFrame(
            coarse_rows, "cell int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/coarse")
        spark.createDataFrame(
            [(self.id_col, self.vec_col, int(self.m))],
            "id_col string, vec_col string, m int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        """Reload a :meth:`save`-d index (faiss ``read_index`` analog).
        float64 centroids round-trip bit-exactly through parquet doubles,
        so a loaded index is search-result-IDENTICAL to the in-session
        one (asserted in ``tests/test_round7_ops.py``).  Only the
        KB-sized coarse/codebook tables are collected; the codes stay a
        lazy distributed scan.

        Versioned layout (:func:`save_index_versioned` /
        :func:`reindex_ivfpq`): if ``<path>/_current.json`` exists, it
        names the live generation subdirectory and the load resolves it
        -- a crash mid-reindex leaves the pointer (and therefore every
        reader) on the old generation.  A legacy flat layout (no
        pointer) loads exactly as before."""
        import numpy as np

        path = _resolve_index_generation(spark, path)
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        coarse_rows = spark.read.parquet(f"{path}/coarse").collect()
        coarse = np.array(
            [r["centroid"] for r in sorted(coarse_rows, key=lambda r: r["cell"])],
            dtype=np.float64,
        )
        codebooks = spark.read.parquet(f"{path}/codebooks")
        book = sorted(
            codebooks.collect(), key=lambda r: (r["sub_id"], r["code"])
        )
        m = int(meta["m"])
        pq_centers = np.array(
            [
                [r["centroid"] for r in book if r["sub_id"] == j]
                for j in range(m)
            ],
            dtype=np.float64,
        )
        codes = spark.read.parquet(f"{path}/codes")
        idx = cls(
            coarse, pq_centers, codebooks, codes,
            meta["id_col"], meta["vec_col"], m,
        )
        idx._source_path = path
        return idx


def ivfpq_build(
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    max_train: int = 100_000,
    max_iter: int = 20,
    persist: bool = True,
) -> IvfPqIndex:
    """Train the coarse quantizer + residual PQ codebooks (bounded
    sample, seeded -- see ``pq_train_codebooks``) and encode the corpus
    in one map-only Arrow pass (``ivfpq_encode``).  This is the ONLY
    corpus-proportional stage of IVF-PQ; ``persist=True`` pins the
    encoded codes so subsequent searches never re-scan the float
    vectors (the faiss ``index.add`` analog)."""
    import numpy as np

    X = _collect_sample(candidates, vec_col, max_train)
    if len(X) < 2:
        raise ValueError(
            f"IVF-PQ training needs >=2 sample vectors, got {len(X)}"
        )
    coarse = _lloyd(X, n_centroids, seed - 1, max_iter)
    cells_of_sample = (
        ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(-1).argmin(1)
    )
    resid_sample = X - coarse[cells_of_sample]

    # residual PQ codebooks trained on the sample's residuals
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim ({dim}) must divide evenly into m ({m})")
    sub = dim // m
    kk = 1 << nbits
    book_rows = []
    for j in range(m):
        centers = _lloyd(
            resid_sample[:, j * sub : (j + 1) * sub], kk, seed + j, max_iter
        )
        for code, ctr in enumerate(centers):
            book_rows.append((j, code, [float(x) for x in ctr]))
    spark = candidates.sparkSession
    codebooks = spark.createDataFrame(
        book_rows, "sub_id int, code int, centroid array<double>"
    )
    # (m, actual_k, sub): _lloyd returns min(2**nbits, |sample|) centroids
    # per subspace -- downstream loops use the ACTUAL count, so tiny
    # corpora work instead of IndexError-ing on the nominal 2**nbits
    pq_centers = np.array(
        [[r[2] for r in book_rows if r[0] == j] for j in range(m)]
    )

    codes = ivfpq_encode(
        candidates, coarse, codebooks, id_col, vec_col,
        pq_centers=pq_centers,
    )
    if persist:
        codes = codes.persist()
    return IvfPqIndex(
        coarse, pq_centers, codebooks, codes, id_col, vec_col, m
    )


def _resolve_index_generation(spark, path: str) -> str:
    """Resolve a versioned index root to its live generation dir via the
    ``_current.json`` pointer; a flat (legacy) layout resolves to
    itself.

    Pointer-absence window (ADVICE r12): ``_publish_manifest`` over an
    EXISTING destination is delete-then-rename, so a concurrent
    :func:`save_index_versioned` swap makes ``_current.json`` vanish for
    a moment.  A load landing in that window must NOT fall back to the
    flat layout (there is no flat ``meta`` in a versioned root) -- when
    ``_gen-*`` dirs exist, the layout IS versioned, so re-read briefly
    until the swapper's rename lands (same claimant-side delayed re-read
    as the writer lease)."""
    import time as _time

    from mqtt_message_pump_spark.sinks import _hadoop_fs, _read_json_object

    fs, HPath = _hadoop_fs(spark, path)
    for attempt in range(5):
        ptr = HPath(f"{path}/_current.json")
        if fs.exists(ptr):
            try:
                cur = _read_json_object(fs, HPath, f"{path}/_current.json")
                return f"{path}/{cur['gen']}"
            except Exception:
                pass  # vanished between exists and open: mid-swap
        if not list(fs.globStatus(HPath(f"{path}/_gen-*"))):
            return path  # flat legacy layout
        _time.sleep(0.1)
    raise IOError(
        f"index root {path} has generation dirs but no readable "
        "_current.json pointer (5 attempts); a versioned swap appears "
        "stuck mid-publish"
    )


def save_index_versioned(index: IvfPqIndex, path: str) -> str:
    """Persist ``index`` as a NEW GENERATION under ``path`` and swap the
    ``_current.json`` pointer to it atomically (the manifest-publish
    primitive from the sink protocol: single small object, write-tmp-
    then-move -- atomic destination appearance on every store class).

    Readers (:meth:`IvfPqIndex.load`) resolve the pointer, so:
    - a crash BEFORE the pointer publish leaves an unreferenced
      generation dir -- the old index stays fully readable;
    - a crash AFTER it leaves the new index live and the old dir
      intact for in-flight readers (reclaimed by the next
      :func:`reindex_ivfpq`'s ``keep_generations`` sweep).

    Returns the generation directory name."""
    import json
    import uuid

    from mqtt_message_pump_spark.sinks import (
        _hadoop_fs,
        _publish_manifest,
        _read_json_object,
    )

    spark = index.codes.sparkSession
    fs, HPath = _hadoop_fs(spark, path)
    seq = 0
    if fs.exists(HPath(f"{path}/_current.json")):
        seq = int(
            _read_json_object(fs, HPath, f"{path}/_current.json").get(
                "seq", 0
            )
        )
    gen = f"_gen-{seq + 1:06d}-{uuid.uuid4().hex[:8]}"
    index.save(f"{path}/{gen}")
    _publish_manifest(
        fs, HPath, path, "_current.json",
        json.dumps({"gen": gen, "seq": seq + 1}, sort_keys=True).encode(),
    )
    return gen


def reindex_ivfpq(
    spark,
    path: str,
    vectors: DataFrame,
    keep_generations: int = 2,
    orphan_retention_secs: float = 3600.0,
    **build_kw,
) -> IvfPqIndex:
    """Execute the retrain the drift monitor (:func:`ivfpq_drift`)
    requests: re-train coarse centers + residual codebooks on a bounded
    sample of the CURRENT corpus (``vectors`` -- the float embeddings
    the codes were built from, e.g. the embeddings sink; codes alone
    are lossy and cannot retrain), re-encode the corpus in one map-only
    Arrow pass, and swap the persisted index atomically
    (:func:`save_index_versioned`).  An append-only index whose new
    vectors fall outside the build-time distribution degrades silently;
    this closes the monitor's loop.

    Cost shape at 100 TB: one ``max_train``-bounded driver sample +
    one full encode pass over ``vectors`` (identical to the original
    build -- the encode IS the corpus-proportional stage) + the
    KB-sized metadata writes; nothing quadratic, no shuffle beyond the
    codes write.  Old generations beyond ``keep_generations`` are
    reclaimed AFTER the pointer swap, so in-flight readers of the
    previous generation finish their scans (same retention posture as
    ``vacuum_sink``).

    ``build_kw`` are :func:`ivfpq_build` knobs (id_col, vec_col,
    n_centroids, m, nbits, seed, max_train...).  Deterministic for a
    given (vectors, seed): rebuilding on an unshifted corpus yields a
    search-result-identical index."""
    import re

    from mqtt_message_pump_spark.sinks import _hadoop_fs

    build_kw.setdefault("persist", False)
    new_index = ivfpq_build(vectors, **build_kw)
    current = save_index_versioned(new_index, path)
    # reclaim old generations: a dir without a meta table is a crash
    # orphan (a reindex died before its pointer publish) -- but only
    # past ``orphan_retention_secs``: ``meta`` is written LAST by
    # IvfPqIndex.save, so a meta-less dir may be a CONCURRENT reindex
    # mid-save, and deleting it would fail that writer (ADVICE r12).
    # The age gate is the vacuum retention rule applied here: fresh
    # dirs are in-flight saves, truly orphaned ones age past it and a
    # later reindex reclaims them.  Complete generations keep the
    # newest keep_generations-1 besides the current one (in-flight
    # readers of the previous generation finish their scans).
    from mqtt_message_pump_spark.sinks import _fs_now_ms

    fs, HPath = _hadoop_fs(spark, path)
    now_ms = _fs_now_ms(fs, HPath, path)
    complete = []
    for st in fs.globStatus(HPath(f"{path}/_gen-*")):
        name = st.getPath().getName()
        if name == current or not re.match(
            r"_gen-\d{6}-[0-9a-f]+$", name
        ):
            continue
        if not fs.exists(HPath(f"{path}/{name}/meta")):
            if (
                now_ms - st.getModificationTime()
                > orphan_retention_secs * 1000
            ):
                fs.delete(HPath(f"{path}/{name}"), True)
            continue
        complete.append(name)
    complete.sort()
    for old in complete[: max(0, len(complete) - max(1, keep_generations) + 1)]:
        fs.delete(HPath(f"{path}/{old}"), True)
    return IvfPqIndex.load(spark, path)


def maintain_ann_index(
    spark,
    index_path: str,
    vectors: DataFrame,
    ratio_threshold: float = 1.5,
    min_cell_sample: int = 25,
    **build_kw,
) -> dict:
    """Close the drift->reindex loop operationally (VERDICT r12 #5):
    ONE call that checks whether the vectors appended since the index
    was built have drifted past ``ratio_threshold`` (the
    :func:`ivfpq_drift` monitor) and, only if so, executes the retrain
    via the atomic versioned swap (:func:`reindex_ivfpq`) -- index
    maintenance as a scheduled one-liner next to compaction
    (``pump maintain --reindex-ann``).

    ``vectors`` is the CURRENT full corpus (e.g. the embeddings sink);
    the baseline/appended split is derived from the index itself: ids
    already in ``codes`` are build-time vectors, the anti-join
    remainder is what was appended under frozen codebooks.  A no-drift
    run costs two bounded map passes + tiny aggregates and swaps
    nothing; build knobs for the retrain default to the LIVE index's
    own geometry (m, nbits, n_centroids), overridable via
    ``build_kw``.

    Returns ``{"appended", "flagged_cells", "reindexed", "recall_safe"}``
    -- ``recall_safe`` False means drift was detected and a rebuild
    ran."""
    import math as _math

    import numpy as np

    idx = IvfPqIndex.load(spark, index_path)
    id_col, vec_col = idx.id_col, idx.vec_col
    indexed_ids = idx.codes.select(id_col).distinct()
    appended = vectors.join(indexed_ids, id_col, "left_anti")
    n_appended = appended.count()
    out = {
        "appended": n_appended,
        "flagged_cells": 0,
        "reindexed": False,
        "recall_safe": True,
    }
    if n_appended == 0:
        return out
    baseline = vectors.join(indexed_ids, id_col, "semi")
    drift = ivfpq_drift(
        idx, baseline, appended, ratio_threshold=ratio_threshold
    )
    # noise guard on the trip wire: a per-cell MSE over a handful of
    # appended vectors swings well past 1.5x on an UNSHIFTED
    # distribution (observed: 5 same-cluster vectors ratio 1.85), and a
    # scheduled maintenance run must not retrain on sampling noise.
    # Cells below ``min_cell_sample`` appends only count when they are
    # a brand-new mode (no build-time vectors at all -- few vectors
    # landing where the build saw NOTHING is a real signal, not noise).
    flagged = drift.filter(
        F.col("retrain")
        & (
            (F.col("n_new") >= min_cell_sample)
            | (F.col("n_base") == 0)
        )
    ).count()
    out["flagged_cells"] = int(flagged)
    if flagged == 0:
        return out
    pq = np.asarray(idx.pq_centers)
    build_kw.setdefault("id_col", id_col)
    build_kw.setdefault("vec_col", vec_col)
    build_kw.setdefault("m", idx.m)
    build_kw.setdefault(
        "nbits", max(1, int(round(_math.log2(pq.shape[1]))))
    )
    build_kw.setdefault("n_centroids", int(np.asarray(idx.coarse).shape[0]))
    reindex_ivfpq(spark, index_path, vectors, **build_kw)
    out["reindexed"] = True
    out["recall_safe"] = False
    return out


def ivfpq_quantization_error(
    df: DataFrame, index: IvfPqIndex, vec_col: str | None = None
) -> DataFrame:
    """Per-cell residual quantization error of ``df``'s vectors under the
    index's FROZEN coarse centers + codebooks: assign -> residual ->
    nearest PQ code per subspace -> summed squared reconstruction error.
    Returns (cell, n_vecs, mse).

    Map-only Arrow kernel + one tiny (<= n_centroids rows) aggregate --
    the same cost class as the encode pass, so it can run over a sampled
    slice of a 100 TB corpus or over each append batch unchanged."""
    import numpy as np
    import pandas as pd

    vec = vec_col or index.vec_col
    coarse = np.asarray(index.coarse, dtype=np.float64)
    pq_centers = np.asarray(index.pq_centers, dtype=np.float64)
    n_sub, _, sub_len = pq_centers.shape

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec].tolist(), dtype=np.float64)
            cells = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(-1).argmin(1)
            resid = X - coarse[cells]
            Rs = resid.reshape(len(pdf), n_sub, sub_len)
            d = ((Rs[:, :, None, :] - pq_centers[None, :, :, :]) ** 2).sum(-1)
            # min over codes per subspace, summed = squared L2 between the
            # residual and its best PQ reconstruction
            err = d.min(2).sum(1)
            yield pd.DataFrame(
                {"cell": cells.astype("int32"), "err": err}
            )

    errs = df.select(
        F.col(vec).cast("array<double>").alias(vec)
    ).mapInPandas(kern, "cell int, err double")
    return errs.groupBy("cell").agg(
        F.count("*").alias("n_vecs"), F.avg("err").alias("mse")
    )


def ivfpq_drift(
    index: IvfPqIndex,
    baseline: DataFrame,
    appended: DataFrame,
    vec_col: str | None = None,
    ratio_threshold: float = 1.5,
) -> DataFrame:
    """Index-maintenance drift monitor (the faiss-operations answer to
    an append-only index degrading silently at scale): compare the
    per-cell residual quantization error of an APPENDED vector batch
    against the BUILD-time distribution under the same frozen codebooks.

    Returns one row per coarse cell: (cell, n_base, mse_base, n_new,
    mse_new, err_ratio, retrain) where ``retrain`` flags cells whose new
    error exceeds ``ratio_threshold`` x build error -- or that received
    appends with NO build-time vectors at all (a brand-new mode the
    codebooks never saw).  The recommended trigger is re-training when
    retrain-flagged cells hold a material share of appended rows; the
    monitor emits the per-cell evidence and leaves the threshold policy
    to the caller (like faiss users re-training on observed recall/error
    drift).

    Cost: two map-only error passes (baseline can be a stored sample or
    the build corpus) + an n_centroids-sized join -- nothing
    corpus-quadratic, safe per append batch at 100 TB."""
    base = ivfpq_quantization_error(baseline, index, vec_col).select(
        "cell",
        F.col("n_vecs").alias("n_base"),
        F.col("mse").alias("mse_base"),
    )
    new = ivfpq_quantization_error(appended, index, vec_col).select(
        "cell",
        F.col("n_vecs").alias("n_new"),
        F.col("mse").alias("mse_new"),
    )
    joined = base.join(new, "cell", "full_outer").select(
        "cell",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        "mse_base",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        "mse_new",
    )
    ratio = F.when(
        F.col("mse_base").isNotNull() & (F.col("mse_base") > 0),
        F.col("mse_new") / F.col("mse_base"),
    )
    return joined.select(
        "*",
        ratio.alias("err_ratio"),
        # mse_base == 0 with nonzero new error is retrain-worthy even
        # though the ratio is undefined (a perfectly-quantized build cell
        # receiving drifted appends, ADVICE r8); coalesce keeps the flag
        # a real boolean when the ratio when-guard yields NULL.
        F.coalesce(
            F.col("mse_new").isNotNull()
            & (
                F.col("mse_base").isNull()
                | (ratio > ratio_threshold)
                | ((F.col("mse_base") == 0) & (F.col("mse_new") > 0))
            ),
            F.lit(False),
        ).alias("retrain"),
    )


def ivfpq_search(
    queries: DataFrame,
    index: IvfPqIndex,
    k: int = 3,
    n_probe: int = 3,
    round_digits: int | None = 6,
    rerank: int | None = None,
    candidates: DataFrame | None = None,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """Search a built :class:`IvfPqIndex`: coarse-cell pruning to each
    query's ``n_probe`` nearest cells, residual-PQ ADC over ONLY those
    cells' codes, optional exact-L2 re-rank of the ``k*rerank``
    shortlist (requires ``candidates`` -- the float-vector table the
    shortlist rows are fetched from).

    Scale shape: no corpus pass at all without rerank -- the query-side
    ADC tables are driver-computed over the bounded query set
    (|Q| * n_probe * m * 2**nbits rows, broadcast), the search join
    matches codes on (cell, sub_id, code) so unprobed cells never join,
    then one keyed sum with map-side combine; with rerank, one
    broadcast-shortlist pass over ``candidates`` fetches just the
    shortlisted vectors.
    """
    import numpy as np

    id_col = id_col or index.id_col
    vec_col = vec_col or index.vec_col
    m = index.m
    coarse, pq_centers = index.coarse, index.pq_centers
    sub = coarse.shape[1] // m
    actual_k = pq_centers.shape[1]
    spark = queries.sparkSession

    # query side: probe lists + per-(query, cell) residual ADC tables,
    # all driver-side numpy over the bounded query set.  r15: the
    # per-query/per-cell/per-code Python loops (|Q| * n_probe * m * 2^b
    # iterations building row tuples) are vectorized into broadcasted
    # numpy ops + ONE pandas createDataFrame -- arithmetic is per-element
    # identical (same subtract/square/sum-over-last-axis per (query,
    # cell, sub, code), same stable argsort), so the ADC table is
    # bit-for-bit the one the loops built, just ~10x cheaper to build
    # and ship (guide SS4.2: hand whole batches to vectorized kernels).
    q_rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).collect()  # bounded: the query set is the small side by contract
    qid_type = dict(queries.dtypes)[id_col]
    if q_rows:
        import pandas as pd

        Q = np.array([r["qv"] for r in q_rows], dtype=np.float64)
        qids = [r["query_id"] for r in q_rows]
        nq = len(q_rows)
        cell_d = ((coarse[None, :, :] - Q[:, None, :]) ** 2).sum(-1)
        probed = np.argsort(cell_d, axis=1, kind="stable")[:, :n_probe]
        # residuals per (query, probed cell): (nq, n_probe, dim)
        resid = Q[:, None, :] - coarse[probed]
        Rs = resid.reshape(nq, n_probe, m, sub)
        # (nq, n_probe, m, k): same per-pair subtract/square/sum
        d = ((Rs[:, :, :, None, :] - pq_centers[None, None, :, :, :]) ** 2).sum(-1)
        n_per_q = n_probe * m * actual_k
        adc_pdf = pd.DataFrame(
            {
                "query_id": np.repeat(np.array(qids, dtype=object), n_per_q),
                "cell": np.repeat(
                    probed.astype("int32"), m * actual_k
                ).ravel(),
                "sub_id": np.tile(
                    np.repeat(np.arange(m, dtype="int32"), actual_k),
                    nq * n_probe,
                ),
                "code": np.tile(
                    np.arange(actual_k, dtype="int32"), nq * n_probe * m
                ),
                "d2": d.ravel(),
            }
        )
        # carry the caller's id type through (string/int query ids work
        # the same as pq_encode's dynamic id_type -- not hardcoded)
        adc = spark.createDataFrame(
            adc_pdf,
            schema=(
                f"query_id {qid_type}, cell int, sub_id int, code int, "
                "d2 double"
            ),
        )
    else:
        adc = spark.createDataFrame(
            [],
            f"query_id {qid_type}, cell int, sub_id int, code int, d2 double",
        )

    dist = (
        index.codes.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(adc), ["cell", "sub_id", "code"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum("d2").alias("pq_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("cand_id")
    )
    if rerank is not None:
        if candidates is None:
            raise ValueError(
                "rerank requires the candidates float-vector table"
            )
        shortlist = (
            dist.withColumn("adc_rank", F.row_number().over(w))
            .filter(F.col("adc_rank") <= k * rerank)
            .select("query_id", "cand_id")
        )
        cv = candidates.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        qv_df = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        exact_d2 = F.aggregate(
            F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dist = (
            cv.join(F.broadcast(shortlist), "cand_id")
            .join(F.broadcast(qv_df), "query_id")
            .select("query_id", "cand_id", exact_d2.alias("pq_dist"))
        )
    if round_digits is not None:
        dist = dist.withColumn("pq_dist", F.round("pq_dist", round_digits))
    return dist.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 3,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    round_digits: int | None = 6,
    max_train: int = 100_000,
    max_iter: int = 20,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors -- the production ANN stack
    (faiss IndexIVFPQ): a coarse quantizer prunes the corpus to the
    query's ``n_probe`` nearest cells, residual-PQ ADC scores only those
    candidates, and (optionally) the ``k*rerank`` shortlist is re-ranked
    with exact L2.

    One-shot convenience over :func:`ivfpq_build` +
    :func:`ivfpq_search` (identical numerics: same seeds, same training
    order).  Where ``pq_topk`` scores EVERY candidate (linear ADC), the
    search touches ~``n_probe/n_centroids`` of the corpus per query --
    the sub-linear search that makes ANN viable at 100 TB.  Production
    (and the registered ``q_ann_ivfpq_search`` key) builds the index
    once and searches it many times instead.
    """
    index = ivfpq_build(
        candidates, id_col, vec_col, n_centroids=n_centroids, m=m,
        nbits=nbits, seed=seed, max_train=max_train, max_iter=max_iter,
        persist=False,
    )
    return ivfpq_search(
        queries, index, k=k, n_probe=n_probe, round_digits=round_digits,
        rerank=rerank, candidates=candidates,
    )
