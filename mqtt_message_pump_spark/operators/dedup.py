"""Deduplication operators for large-scale training-data pipelines.

All of these are additive scope over the reference (SURVEY.md SS2.8) and
are designed shuffle-light for 100 TB:

- exact dedup: one hash aggregation on the dedup key (map-side combine);
  at scale the key is a digest, never the full document text.
- MinHash + LSH: per-row signature computation is a narrow map (array
  expressions, no UDF); banding turns the quadratic all-pairs problem into
  a groupBy on band buckets, so the only shuffle is on (band, bucket-hash)
  and candidate verification touches only co-bucketed pairs.
- SimHash: 64-bit signature via bit-vote aggregation; near-dup = small
  Hamming distance, banded the same way.
- n-gram Jaccard: verification metric for candidate pairs (array
  intersection over distinct shingles).
- embedding cosine near-dup: LSH over random hyperplane sign bits, exact
  cosine verification within buckets.

Two hash families are provided: ``xxhash64`` (JVM built-in, the fast
production path) and an md5-derived 32-bit hash that DuckDB reproduces
bit-for-bit (the oracle-checkable path used by the registered queries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: the classic universal-hash modulus; coefficients
# below are small odd constants so both engines compute identical int64 math.
MINHASH_PRIME = 2147483647


def md5_hash32(col: Column) -> Column:
    """Deterministic 32-bit hash reproducible in DuckDB as
    ``CAST('0x' || substring(md5(x), 1, 8) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a space-tokenized text column.
    Pure array expressions -> whole-stage codegen, no UDF."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def minhash_signature(
    shingles: Column, num_hashes: int = 8, hash32: bool = True
) -> list[Column]:
    """MinHash signature: for each hash function i, min over shingles of
    ``(a_i * h(s) + b_i) mod p``.  ``hash32=True`` uses the md5-derived
    oracle-reproducible hash; otherwise xxhash64 (faster, JVM)."""
    def make_h(a: int, b: int, use32: bool):
        # NB: PySpark higher-order functions inspect the lambda's arity, so
        # the closure must produce a clean single-parameter lambda (default
        # args would be miscounted as extra lambda variables).
        if use32:
            return lambda s: (a * md5_hash32(s) + b) % MINHASH_PRIME
        return lambda s: (a * F.xxhash64(s) + b) % MINHASH_PRIME

    sigs = []
    for i in range(num_hashes):
        a, b = 2 * i + 1, 1000003 * (i + 1)
        h = make_h(a, b, hash32)
        sigs.append(F.array_min(F.transform(shingles, h)).alias(f"mh_{i}"))
    return sigs


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
    hash32: bool = True,
) -> DataFrame:
    sh = shingles_col(F.col(text_col), shingle_n)
    return df.select(
        "*", *minhash_signature(sh, num_hashes=num_hashes, hash32=hash32)
    )


def lsh_band_buckets(
    df: DataFrame, num_hashes: int, bands: int, id_col: str
) -> DataFrame:
    """Assign each row to `bands` LSH buckets (rows-per-band =
    num_hashes/bands).  Returns (id, band, bucket) -- the shuffle key for
    candidate generation is (band, bucket), never the document."""
    rows = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        out.append(
            df.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bucket"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    hash32: bool = True,
) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) from MinHash LSH.
    Self-join happens only within (band, bucket) groups."""
    sigs = with_minhash(df, text_col, num_hashes, shingle_n, hash32)
    buckets = lsh_band_buckets(sigs, num_hashes, bands, id_col)
    left = buckets.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    right = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| over
    distinct shingles.  Joins shingle arrays to the (small) pair list."""
    sh = df.select(
        F.col(id_col), shingles_col(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


def simhash_bits(text: Column, bits: int = 16, hash32: bool = True) -> Column:
    """SimHash signature over tokens: per bit, tokens vote +1/-1 with the
    bit of their hash; the signature bit is 1 when the vote is positive.
    Pure array expressions (transform + aggregate), linear in tokens."""
    toks = tokens_col(text)
    hashes = F.transform(
        toks, (lambda t: md5_hash32(t)) if hash32 else (lambda t: F.xxhash64(t))
    )

    def make_vote(b: int):
        return lambda acc, h: acc + (
            F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1
        )

    bit_cols = []
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), make_vote(b))
        bit_cols.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return total.cast("long")


def with_simhash(
    df: DataFrame, text_col: str = "text", bits: int = 16, hash32: bool = True
) -> DataFrame:
    return df.withColumn("simhash", simhash_bits(F.col(text_col), bits, hash32))


def hamming_distance(a: Column, b: Column, bits: int = 16) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def exact_dedup(
    df: DataFrame, dedup_cols: list[str], id_col: str
) -> DataFrame:
    """Exact dedup keeping the minimum id per duplicate group -- a single
    hash aggregation; deterministic (unlike dropDuplicates' arbitrary
    first-seen row)."""
    return df.groupBy(*dedup_cols).agg(F.min(id_col).alias(id_col))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.  With ``planes`` (random
    hyperplanes) candidates are restricted to rows sharing the sign-bit
    bucket; without, all pairs are compared (test scale only)."""
    from mqtt_message_pump_spark.operators.similarity import cosine_expr, sign_bucket

    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    if planes is not None:
        v = v.withColumn("bucket", sign_bucket(F.col("v"), planes))
        a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "bucket")
        b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
        b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
