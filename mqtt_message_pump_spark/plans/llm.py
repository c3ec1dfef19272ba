"""Registered queries for the LLM-data-pipeline extensions (SURVEY.md
SS2.8): dedup family, similarity search, text analysis.

The oracle SQL for the hash-based operators (minhash / simhash /
fingerprint) is generated from the same constants as the Spark
implementation, using only cross-engine-deterministic primitives (md5,
int64 arithmetic, left-to-right list folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mqtt_message_pump_spark.functions import text as TX
from mqtt_message_pump_spark.operators import dedup as DD
from mqtt_message_pump_spark.operators import similarity as SIM
from mqtt_message_pump_spark.plans.registry import materialize_once, query, table

# ---------------------------------------------------------------- text ---


@query(
    "q_text_stats",
    oracle=f"""
    SELECT doc_id, lang,
           {TX.SQL_TOKEN_COUNT.format(text='text')} AS n_tokens,
           {TX.SQL_REGEX_TOKEN_COUNT.format(text='text')} AS n_alnum_tokens,
           length(text) AS n_chars_calc,
           {TX.SQL_STOPWORD_COUNT.format(text='text')} AS n_stop
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + basic text statistics; pure string/array
    expressions, zero shuffle."""
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        TX.token_count(t).alias("n_tokens"),
        TX.regex_token_count(t).alias("n_alnum_tokens"),
        F.length(t).alias("n_chars_calc"),
        TX.stopword_count(t).alias("n_stop"),
    )


@query(
    "q_quality_score",
    oracle=f"""
    SELECT doc_id,
           (least((CAST(n_char AS DOUBLE) / n_tok) / 10.0, 1.0) + (n_stop / n_tok))
             * 0.5 * least(n_tok / 100.0, 1.0) AS quality
    FROM (
      SELECT doc_id,
             CAST({TX.SQL_TOKEN_COUNT.format(text='text')} AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_char,
             CAST({TX.SQL_STOPWORD_COUNT.format(text='text')} AS DOUBLE) AS n_stop
      FROM documents)
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (length / stopword-ratio blend)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


@query(
    "q_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM (
      SELECT doc_id, lang,
             {TX.sql_lang_score('text', 'en')} AS s_en,
             {TX.sql_lang_score('text', 'es')} AS s_es,
             {TX.sql_lang_score('text', 'de')} AS s_de
      FROM documents)
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID via stopword-profile argmax."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", TX.lang_id(F.col("text")).alias("predicted_lang")
    )


@query(
    "q_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {TX.SQL_FINGERPRINT.format(text='text')} AS fp
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (order-sensitive token fold)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


# --------------------------------------------------------------- dedup ---


@query(
    "q_dedup",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
    """,
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct text; a single
    hash aggregation.  At scale, group on md5(text) instead of raw text."""
    docs = table(spark, sf_dir, "documents")
    return DD.exact_dedup(docs, ["text"], "doc_id").select("doc_id", "text")


_NH, _BANDS, _SHN = 8, 4, 3
_SQL_HASH32 = "CAST('0x' || substring(md5({s}), 1, 8) AS BIGINT)"
_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(string_split(text, ' ')) - 1, 2)), "
    "i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))"
)


def _sql_minhash_cols() -> str:
    cols = []
    for i in range(_NH):
        a, b = 2 * i + 1, 1000003 * (i + 1)
        h = _SQL_HASH32.format(s="s")
        cols.append(
            f"list_min(list_transform(sh, s -> ({a} * {h} + {b}) % "
            f"{DD.MINHASH_PRIME})) AS mh_{i}"
        )
    return ",\n           ".join(cols)


@query(
    "q_dedup_minhash",
    oracle=f"""
    SELECT doc_id,
           {_sql_minhash_cols()}
    FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 hashes over distinct 3-token shingles); the
    narrow-map half of MinHash-LSH dedup."""
    docs = table(spark, sf_dir, "documents", split="doc_id")
    return DD.minhash_signatures(
        docs, "doc_id", "text", num_hashes=_NH, shingle_n=_SHN, hash32=True
    )


def _sql_band_buckets() -> str:
    rows = _NH // _BANDS
    selects = []
    for b in range(_BANDS):
        cols = [f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)]
        selects.append(
            f"SELECT doc_id, {b} AS band, concat_ws('_', {', '.join(cols)}) "
            "AS bucket FROM sigs"
        )
    return "\n      UNION ALL\n      ".join(selects)


@query(
    "q_minhash_pairs",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs (4 bands x 2 rows): the only shuffle is on the
    (band, bucket) key; the quadratic comparison never materializes."""
    docs = table(spark, sf_dir, "documents", split="doc_id")
    return DD.minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN
    )


# Shared candidate-pair skeleton for the dedup verifiers: shingle arrays
# joined to the deterministic adjacent-id pair generator (production
# swaps in the q_minhash_pairs candidate list; the verify metric is
# unchanged).  The SQL twin mirrors the same CTE.
_SQL_PAIR_FROM = (
    f"WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents)"
    "\n    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb"
    "\n    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1"
)


def _shingle_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16 (guide SS1.2/SS5, the q_source_kl idiom): the shingle frame is
    # materialized once (lazy localCheckpoint) -- the self-join's two
    # sides each re-ran the scan -> repartition -> shingle build
    # (Catalyst has no common-subplan reuse, docs/SCALE.md SS5b), i.e.
    # two corpus passes + two O(text) shingle constructions per
    # execution of q_ngram_jaccard / q_ngram_containment where one
    # suffices; the join's own key exchanges are unchanged.
    docs = table(spark, sf_dir, "documents", split=True)
    sh = docs.select(
        "doc_id", DD.shingles_col(F.col("text"), _SHN).alias("s")
    ).transform(materialize_once)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    return a.join(b, F.col("id_b") == F.col("id_a") + 1)


@query(
    "q_ngram_jaccard",
    oracle=f"""
    SELECT id_a, id_b,
           CAST(len(list_intersect(sa, sb)) AS DOUBLE)
             / len(list_distinct(list_concat(sa, sb))) AS jaccard
    FROM ({_SQL_PAIR_FROM})
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity on candidate pairs (adjacent ids
    here as the deterministic pair generator; production uses the LSH
    candidates from q_minhash_pairs)."""
    joined = _shingle_candidate_pairs(spark, sf_dir)
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    return joined.select("id_a", "id_b", (inter / union).alias("jaccard"))


_SIM_BITS = 16


def _sql_simhash(bits: int = _SIM_BITS) -> str:
    votes = []
    for b in range(bits):
        votes.append(
            "CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)), "
            f"(a, x) -> a + x) > 0 THEN {1 << b} ELSE 0 END"
        )
    return " + ".join(votes)


@query(
    "q_dedup_simhash",
    oracle=f"""
    SELECT doc_id, CAST({_sql_simhash()} AS BIGINT) AS simhash
    FROM (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            s -> {_SQL_HASH32.format(s='s')}) AS hs
      FROM documents)
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (16-bit, token bit-vote); near-dup detection is
    then Hamming distance over the signature, banded like MinHash."""
    docs = table(spark, sf_dir, "documents", split="doc_id")
    return DD.simhash_signatures(
        docs, "doc_id", "text", bits=_SIM_BITS, hash32=True
    )


_SIMP_BITS = 32  # banded-pairs signature width (md5-hash32 bounded)
_SIMP_HAMMING = 3
_SIMP_BANDS = 4


@query(
    "q_simhash_pairs",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, CAST({_sql_simhash(_SIMP_BITS)} AS BIGINT) AS simhash
      FROM (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                              s -> {_SQL_HASH32.format(s='s')}) AS hs
        FROM documents))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMP_HAMMING}
    """,
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs: every pair within Hamming distance
    3 of the 32-bit signature.  The Spark plan is banded LSH
    (:func:`DD.simhash_candidate_pairs` -- bucket on 8-bit signature
    bands, verify inside buckets, never all-pairs); the oracle is the
    brute-force all-pairs SQL.  Their equality under the driver's hash
    compare IS the 100% recall proof: max_hamming < bands guarantees by
    pigeonhole that no within-radius pair escapes banding."""
    docs = table(spark, sf_dir, "documents", split="doc_id")
    return DD.simhash_candidate_pairs(
        docs,
        "doc_id",
        "text",
        bits=_SIMP_BITS,
        bands=_SIMP_BANDS,
        max_hamming=_SIMP_HAMMING,
    )


_SIMP_CAP = 4  # binds at every SF (sf0.01 has simhash buckets up to 128)


@query(
    "q_simhash_pairs_capped",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, CAST({_sql_simhash(_SIMP_BITS)} AS BIGINT) AS simhash
      FROM (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                              s -> {_SQL_HASH32.format(s='s')}) AS hs
        FROM documents)),
    buckets AS (
      SELECT doc_id, simhash, bands.band,
             (simhash >> (bands.band * {_SIMP_BITS // _SIMP_BANDS}))
               & {(1 << (_SIMP_BITS // _SIMP_BANDS)) - 1} AS bucket
      FROM sigs, (SELECT CAST(unnest(range(0, {_SIMP_BANDS})) AS INT)
                  AS band) bands),
    kept AS (
      SELECT doc_id, simhash, band, bucket FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS n
        FROM buckets)
      WHERE n <= {_SIMP_CAP})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM kept a JOIN kept b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMP_HAMMING}
    """,
)
def q_simhash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form of SimHash candidate generation (simhash twin
    of q_minhash_pairs_capped): identical to q_simhash_pairs but with
    the hot-bucket cap ENGAGED -- (band, bucket) groups above the cap
    are boilerplate-dominated signature regions whose pair expansion is
    quadratic (the 25x probe measured the uncapped path at ~625x pair
    multiplicity on a dup-heavy corpus, docs/SCALE.md SS8); dropping
    them bounds every bucket's output at cap^2 at a documented recall
    cost, while exact duplicates still pair through q_dedup.  The
    fixture cap of {_SIMP_CAP} binds hard at every SF (725 -> 24 pairs
    at sf0.01), so the key oracle-checks the cap semantics themselves.

    r12: realized by the COLLAPSE-AWARE generator (bands one
    representative per distinct text, multiplicity-weighted cap,
    class-map pair expansion -- output-identical under the same oracle;
    see ``minhash_candidate_pairs_collapsed``), closing the r11 probe's
    duplicate-multiplicity cost on dup-heavy corpora."""
    docs = table(spark, sf_dir, "documents", split=True)
    return DD.simhash_candidate_pairs_collapsed(
        docs, "doc_id", "text", bits=_SIMP_BITS, bands=_SIMP_BANDS,
        max_hamming=_SIMP_HAMMING, max_bucket_size=_SIMP_CAP,
    )


@query(
    "q_dedup_groups",
    oracle=f"""
    WITH RECURSIVE sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
    )
    SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id
    """,
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH
    candidate graph; every doc gets its cluster's min id as ``group_id``
    (keep-one-per-group dedup = filter doc_id == group_id).  Min-label
    propagation converges to the exact transitive closure, so it matches
    the oracle's recursive CTE.

    This is the DIRECT path (pairs over every doc) -- right when content
    is mostly distinct, like this fixture (4992/5000 distinct texts:
    collapsing first is pure overhead, measured +2 s of fixed job cost
    at sf0.1 for zero graph shrinkage).  The dup-heavy production twin
    is ``q_dedup_groups_collapsed``."""
    docs = table(spark, sf_dir, "documents", split="doc_id")
    # distinct=True again (r16): CC is edge-multiplicity-insensitive, so
    # r15 dropped the pair-dedup exchange -- but EVERY propagation round
    # joins the full edge list, so the ~bands-fold multiplicity taxes d
    # rounds while the dedup costs one exchange.  10x interleaved A/B:
    # distinct 11.8 s vs 14.25 s; sf0.1 neutral (1.04 vs 1.01).
    pairs = DD.minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN,
        distinct=True,
    )
    # vertex side unsplit (r15): the split repartition only pays off on
    # the signature pipeline; on the label join-back it was a pure
    # exchange of the id column (the broadcast join needs no partitioning)
    verts = table(spark, sf_dir, "documents")
    return DD.connected_components(verts, pairs, "doc_id", "id_a", "id_b")


@query(
    "q_dedup_groups_collapsed",
    oracle=f"""
    WITH RECURSIVE sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
    )
    SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id
    """,
)
def q_dedup_groups_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dup-heavy production twin of q_dedup_groups: the SAME
    transitive closure (identical oracle -- the exact-dup pre-collapse
    is exactness-preserving, see ``operators.dedup.near_dup_groups``)
    computed over one representative per distinct text, labels expanded
    back through the class map.

    Why a twin instead of a swap: cost tracks DISTINCT content instead
    of duplicate multiplicity -- on the 100x-duplicated probe corpus the
    direct path walks a 68M-edge graph (102 s, 34x) while this path
    re-collapses it to the 4.4k distinct-content edges (5.4 s, 1.1x,
    docs/SCALE.md SS10b); on mostly-distinct data the collapse is ~2 s
    of pure overhead.  Crawl-scale dedup inputs are dup-heavy by
    definition, so production pipelines run THIS one."""
    docs = table(spark, sf_dir, "documents", split=True)
    return DD.near_dup_groups(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN
    )


@query(
    "q_dedup_groups_auto",
    oracle=f"""
    WITH RECURSIVE sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
    )
    SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id
    """,
)
def q_dedup_groups_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering with the collapse-vs-direct choice made BY THE
    OPERATOR (``operators.dedup.near_dup_groups_auto``): one cheap
    ``approx_count_distinct(md5(text))/count`` scan estimates the dup
    ratio and picks the path -- the 100x probe showed choosing wrong
    costs 34x (direct on dup-heavy) vs 1.1x (collapsed), and before this
    key the choice was the caller's to get wrong.  Both branches are
    label-identical (the collapse is exactness-preserving), so the SAME
    recursive-CTE oracle checks whichever branch the estimate picks; on
    this mostly-distinct fixture (4992/5000) it picks direct, and
    ``tests/test_round11_ops.py`` pins the dup-heavy branch choice +
    label identity on a duplicated corpus."""
    docs = table(spark, sf_dir, "documents", split=True)
    return DD.near_dup_groups_auto(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN
    )


# ---------------------------------------------------------- similarity ---



_TOPK = 3
_NQ = 5  # query vectors: vec_id < 5


def _sql_cosine(a: str, b: str) -> str:
    # Explicit double fold matching Spark's left-to-right zip_with/aggregate.
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


_SQL_VD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@query(
    "q_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, {_SQL_VD} AS vd FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({_sql_cosine('q.vd', 'c.vd')}, 6) AS cosine
      FROM v q JOIN v c ON q.vec_id < {_NQ} AND c.vec_id <> q.vec_id)
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM scored)
    WHERE rank <= {_TOPK}
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query set, codegen'd array dot
    product, per-query window rank with deterministic tie-break."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    return SIM.brute_force_topk(queries, emb, k=_TOPK).select(
        "query_id", "cand_id", "cosine", "rank"
    )


_KNN = 5


@query(
    "q_centroid_assign",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, {_SQL_VD} AS vd FROM embeddings),
    cent AS (
      SELECT label, list(c ORDER BY dim) AS cd FROM (
        SELECT label, i.i AS dim,
               CAST(SUM(CAST(trunc(CAST(embedding[i.i] AS DOUBLE) * 1e9)
                             AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*) AS c
        FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i
        GROUP BY label, i.i)
      GROUP BY label),
    scored AS (
      SELECT v.vec_id, v.label AS true_label, cent.label AS cand_label,
             round(list_dot_product(v.vd, cent.cd), 6) AS score
      FROM v CROSS JOIN cent)
    SELECT vec_id, true_label, cand_label AS assigned_label, score FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY score DESC, cand_label) AS rn
      FROM scored)
    WHERE rn = 1
    """,
)
def q_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment: every embedding classified to the
    label centroid maximizing the dot product -- the IVF coarse-quantizer
    assignment step / centroid classifier.  Two-phase: exact centroids
    (the q_label_centroid integer nano-unit aggregate, so both engines
    hold bit-identical centroid doubles), assembled into ordered arrays
    and BROADCAST (label-cardinality rows); the scan side then scores
    with the deterministic left-to-right dot fold and keeps the argmax
    via round-6 + label tie-break (the q_cosine_topk idiom).  Per-row
    work only on the big side -- no shuffle of the corpus beyond the
    argmax window keyed by vec_id, which row_number prunes to 1."""
    emb = table(spark, sf_dir, "embeddings", split=True)
    comp = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "comp"),
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        (F.col("comp").cast("double") * F.lit(1e9)).cast("long").alias("c"),
    )
    cent = (
        comp.groupBy("label", "dim")
        .agg(
            (F.sum("c").cast("double") / F.lit(1e9) / F.count("*")).alias(
                "centroid_c"
            )
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "centroid_c"))),
                lambda x: x["centroid_c"],
            ).alias("cd")
        )
        .select(F.col("label").alias("cand_label"), "cd")
    )
    v = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.col("embedding").cast("array<double>").alias("vd"),
    )
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "true_label",
        "cand_label",
        F.round(SIM.dot_expr(F.col("vd"), F.col("cd")), 6).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.desc("score"), F.asc("cand_label")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "true_label",
            F.col("cand_label").alias("assigned_label"),
            "score",
        )
    )


@query(
    "q_knn_label",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, {_SQL_VD} AS vd FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             c.label AS cand_label, c.vec_id AS cand_id,
             round({_sql_cosine('q.vd', 'c.vd')}, 6) AS cosine
      FROM v q JOIN v c ON q.vec_id < {_NQ} AND c.vec_id <> q.vec_id),
    knn AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
        FROM scored)
      WHERE rank <= {_KNN}),
    votes AS (
      SELECT query_id, true_label, cand_label, COUNT(*) AS votes
      FROM knn GROUP BY query_id, true_label, cand_label)
    SELECT query_id, true_label, cand_label AS predicted_label, votes
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY votes DESC, cand_label) AS rn
      FROM votes)
    WHERE rn = 1
    """,
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label vote: classify each query vector by the majority label
    of its k nearest neighbors (cosine), ties broken by label --
    the eval-time classifier over an embedded corpus.  Composes the
    broadcast brute-force top-k (q_cosine_topk's exact path; swap the IVF
    or LSH candidate generator at 100 TB, same downstream vote) with a
    label lookup: the k x |Q| neighbor list is BROADCAST back against the
    corpus for its labels, so the big side is never shuffled; the vote
    itself aggregates k rows per query."""
    emb = table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    queries = emb.filter(F.col("vec_id") < _NQ)
    knn = SIM.brute_force_topk(queries, emb, k=_KNN).select(
        "query_id", "cand_id"
    )
    labeled = (
        labels.join(
            F.broadcast(knn), labels.vec_id == F.col("cand_id")
        ).select("query_id", F.col("label").alias("cand_label"))
    )
    true_lab = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    ).filter(F.col("query_id") < _NQ)
    votes = (
        labeled.groupBy("query_id", "cand_label")
        .agg(F.count("*").alias("votes"))
        .join(F.broadcast(true_lab), "query_id")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("cand_label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("cand_label").alias("predicted_label"),
            "votes",
        )
    )


@query("q_ann_lsh")  # rows-only: recall checked in tests vs brute force
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH buckets: compares only
    within the query's sign-bit bucket (corpus/2^planes work reduction)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    return SIM.lsh_topk(queries, emb, k=_TOPK, num_planes=4).select(
        "query_id", "cand_id", "cosine", "rank"
    )


@query("q_ann_ivf")  # rows-only: recall checked in tests vs brute force
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via an IVF coarse quantizer (pyspark.ml KMeans):
    corpus bucketed by nearest centroid, queries probe the closest cells;
    the search join shuffles on centroid id only."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    return SIM.ivf_topk(
        queries, emb, k=_TOPK, n_centroids=8, n_probe=3
    ).select("query_id", "cand_id", "cosine", "rank")


@query("q_pq_codes")  # rows-only: k-means codebooks not SQL-expressible
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each embedding becomes m=8 4-bit
    codes (one row per (vec_id, sub_id) -- the long form keeps the
    registered output scalar-only), codebooks trained per subspace on a
    bounded sample.  At 4 bits/subvector the encoded corpus is ~64x
    smaller than float32 -- the memory side of a 100 TB ANN index; the
    distortion and coverage properties are asserted in tests.  Training
    is sample/iteration-bounded (10k vectors, 10 k-means iterations) so
    the codebook cost is corpus-size-independent."""
    emb = table(spark, sf_dir, "embeddings")
    # r15: train once driver-side and hand the centers straight to the
    # encode kernel -- the codebook frame no longer round-trips through
    # a collect job (same rows, one scheduled job fewer)
    rows = SIM._pq_train_rows(
        emb, "embedding", 8, 4, 42, 10_000, 10
    )
    books = spark.createDataFrame(
        rows, "sub_id int, code int, centroid array<double>"
    )
    return SIM.pq_encode(
        emb, books, "vec_id", "embedding", m=8,
        pq_centers=SIM._rows_to_centers(rows),
    )


@query("q_ann_pq")  # rows-only: recall checked in tests vs brute force
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via PQ asymmetric distance + exact re-rank: the
    corpus lives as m=8 4-bit codes at search time; each query
    broadcasts its per-centroid distance table, a candidate's ADC
    distance is m table lookups summed, and only the k*8 shortlist has
    its float vectors fetched for the exact final ordering.  The encode
    pass is the only corpus-proportional stage; search is a broadcast
    join on (sub_id, code) + a keyed sum with map-side combine + a
    broadcast-shortlist re-rank pass."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    return SIM.pq_topk(
        queries, emb, k=_TOPK, m=8, nbits=4, rerank=8,
        max_train=10_000, max_iter=10,
    ).select("query_id", "cand_id", "pq_dist", "rank")


@query("q_ann_ivfpq")  # rows-only: recall checked in tests vs exact L2
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate NN (the faiss-style production stack): a
    coarse quantizer prunes the corpus to each query's 3 nearest cells,
    residual-PQ ADC scores ONLY those candidates (~n_probe/n_centroids
    of the corpus -- sub-linear where q_ann_pq's flat ADC is linear),
    and the k*8 shortlist re-ranks with exact L2.  Index build is one
    map-only Arrow pass (fused cell-assign + residual encode)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    return SIM.ivfpq_topk(
        queries, emb, k=_TOPK, n_centroids=16, n_probe=3, m=8, nbits=4,
        rerank=8, max_train=10_000, max_iter=10,
    ).select("query_id", "cand_id", "pq_dist", "rank")


# build-once/search-many: one IVF-PQ index per (Spark app, sf_dir),
# codes persisted -- repeat invocations (the bench's min-of-3, a real
# user's query stream) skip training AND the corpus encode pass entirely
_IVFPQ_INDEX: dict[tuple[str, str], "SIM.IvfPqIndex"] = {}


def ivfpq_index_for(spark: SparkSession, sf_dir: str) -> "SIM.IvfPqIndex":
    key = (spark.sparkContext.applicationId, sf_dir)
    idx = _IVFPQ_INDEX.get(key)
    if idx is None:
        emb = table(spark, sf_dir, "embeddings")
        idx = SIM.ivfpq_build(
            emb, "vec_id", "embedding", n_centroids=16, m=8, nbits=4,
            max_train=10_000, max_iter=10, persist=True,
        )
        # materialize the persisted codes now so "search" never pays the
        # encode pass, then drop stale entries from dead sessions
        idx.codes.count()
        for k in [k for k in _IVFPQ_INDEX if k[0] != key[0]]:
            del _IVFPQ_INDEX[k]
        _IVFPQ_INDEX[key] = idx
    return idx


@query("q_ann_ivfpq_search")  # rows-only: recall checked in tests vs exact L2
def q_ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-only IVF-PQ over a PERSISTED index (the faiss
    build-once/search-many separation the one-shot q_ann_ivfpq cannot
    express): the index -- coarse centers, residual codebooks, encoded
    corpus codes -- is built and pinned once per (session, sf_dir) by
    ``ivfpq_index_for``; this key only probes it.  Same parameters and
    seeds as q_ann_ivfpq, so the results are identical (asserted in
    tests); what changes is the benched cost -- cell pruning + ADC +
    exact re-rank of the k*8 shortlist, with NO training and no corpus
    encode in the measured path."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    idx = ivfpq_index_for(spark, sf_dir)
    return SIM.ivfpq_search(
        queries, idx, k=_TOPK, n_probe=3, rerank=8, candidates=emb
    ).select("query_id", "cand_id", "pq_dist", "rank")


@query("q_ann_index_drift")  # rows-only: per-cell MSE is float-reduction-order
def q_ann_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-maintenance drift monitor for the persisted IVF-PQ index
    (the operational gap an append-only ANN index has at 100 TB: frozen
    codebooks degrade silently as the embedding distribution shifts;
    faiss users re-train on observed drift).  The fixture appends a
    DELIBERATELY shifted batch (every component +0.5 -- a new embedding
    model / domain mode) next to an in-distribution control slice; the
    monitor reports per-cell build-vs-append residual quantization error
    and flags cells needing re-training.  Tests assert the shifted batch
    trips the flag while the control batch does not.  Two map-only Arrow
    error passes + an n_centroids-row join -- per-append-batch cost,
    never corpus-quadratic."""
    emb = table(spark, sf_dir, "embeddings")
    idx = ivfpq_index_for(spark, sf_dir)
    shifted = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(0.5)).alias("embedding"),
    )
    return SIM.ivfpq_drift(idx, emb, shifted).orderBy("cell")


@query(
    "q_embed_near_dup",
    oracle=f"""
    WITH v AS (SELECT vec_id, {_SQL_VD} AS vd FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_sql_cosine('a.vd', 'b.vd')}, 6) AS cosine
    FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
    WHERE round({_sql_cosine('a.vd', 'b.vd')}, 6) >= 0.0
    """,
)
def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup scoring on deterministic candidate pairs
    (adjacent ids; production pairs come from the LSH buckets)."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("vd"))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("vd").alias("va"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("vd").alias("vb"))
    joined = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    cos = F.round(SIM.cosine_expr(F.col("va"), F.col("vb")), 6)
    return joined.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= 0.0
    )


@query(
    "q_corpus_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             (least((CAST(length(text) AS DOUBLE)
                     / {TX.SQL_TOKEN_COUNT.format(text='text')}) / 10.0, 1.0)
              + (CAST({TX.SQL_STOPWORD_COUNT.format(text='text')} AS DOUBLE)
                 / {TX.SQL_TOKEN_COUNT.format(text='text')}))
               * 0.5
               * least({TX.SQL_TOKEN_COUNT.format(text='text')} / 100.0, 1.0)
               AS quality
      FROM documents
    ), filtered AS (
      SELECT * FROM scored
      WHERE quality >= 0.2 AND lang IN ('en', 'de', 'fr')
    ), deduped AS (
      SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
             MIN(quality) AS quality
      FROM filtered GROUP BY text
    )
    SELECT doc_id, lang, quality
    FROM deduped
    WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 20
          < (CASE lang WHEN 'en' THEN 10 ELSE 5 END)
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation in ONE plan: quality scoring
    -> quality + language gate -> exact dedup (min-id per text group) ->
    stratified hash sampling.

    r16 restructure (results identical, proven against the oracle): the
    original shape computed the tokenization-heavy quality expression
    TWICE per row (Catalyst pushes the ``quality >= 0.2`` filter below the
    projection that defines it -- guide SS4.4's duplicated-expression
    pattern, here with built-ins) and ran both evaluations inside the
    single-task scan stage of the one-row-group local fixture.  Now the
    scan is hash-repartitioned on the dedup key ``text`` (one exchange,
    reused by the groupBy -- guide SS2.4), the lang gate runs pre-shuffle,
    and quality is computed INSIDE the aggregate as ``min(quality(text))``:
    quality is a pure function of the group key, so the group minimum IS
    the per-row value, the ``>= 0.2`` gate commutes with the groupBy (it
    only ever drops whole groups), and the expression is evaluated exactly
    once per surviving-lang row, 32-way parallel, with no recomputation at
    the filter.  At 100 TB the shuffle key swaps to md5(text) so the
    exchange carries digests, not documents.

    MIN(lang)/MIN(quality) (not ANY_VALUE) keeps the group attributes
    deterministic even if a future fixture gave identical texts different
    langs."""
    docs = table(spark, sf_dir, "documents", split="text")
    filtered = docs.filter(F.col("lang").isin("en", "de", "fr"))
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min(TX.quality_score(F.col("text"))).alias("quality"),
    )
    from mqtt_message_pump_spark.operators.dedup import md5_hash32

    bucket = md5_hash32(F.col("doc_id").cast("string")) % 20
    threshold = F.when(F.col("lang") == "en", 10).otherwise(5)
    return deduped.filter(
        (F.col("quality") >= 0.2) & (bucket < threshold)
    ).select("doc_id", "lang", "quality")


@query(
    "q_term_freq",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS n
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    )
    SELECT doc_id, token AS top_token, n AS top_n
    FROM (
      SELECT doc_id, token, n,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY n DESC, token) AS rn
      FROM tf)
    WHERE rn = 1
    """,
)
def q_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dominant term: tokenize -> explode -> (doc, token)
    count -> window top-1 (lexicographic tie-break).  The classic text
    fan-out shape: explode multiplies rows by tokens-per-doc, so the
    (doc_id, token) aggregate MUST partial-aggregate map-side before the
    shuffle -- at 100 TB the exploded stream is ~100x the corpus and
    only the combined counts may hit the wire.  Window partitions by
    doc_id, so the rank sort is local to each doc's token counts."""
    docs = table(spark, sf_dir, "documents", split=True)
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("token"))
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("token").alias("top_token"),
            F.col("n").alias("top_n"),
        )
    )


@query(
    "q_label_centroid",
    oracle="""
    WITH comp AS (
      SELECT label, i.i AS dim,
             CAST(trunc(CAST(embedding[i.i] AS DOUBLE) * 1e9) AS BIGINT) AS c
      FROM embeddings,
           (SELECT unnest(generate_series(1, 64)) AS i) i
    )
    SELECT label, dim,
           CAST(SUM(c) AS DOUBLE) / 1e9 / COUNT(*) AS centroid_c,
           COUNT(*) AS n_vecs
    FROM comp GROUP BY label, dim
    """,
)
def q_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension) -- the
    distributed vector-mean primitive under IVF training / cluster
    refinement.  posexplode fans each vector into 64 component rows, the
    (label, dim) aggregate partial-combines map-side, and components are
    quantized to TRUNCATED integer nano-units and summed as int64, so the
    sum is exact and order-independent (a double sum would drift with
    partition count).  Truncation, not rounding: a float whose binary
    expansion has exactly 10 fractional bits ends in ...5 at decimal
    scale 9, and the engines break that rounding tie differently
    (HALF_UP vs half-even -- observed at sf0.1), while truncation of the
    bit-identical IEEE product has no tie to break.  Spark's double->long
    cast truncates; DuckDB needs explicit trunc() (its cast rounds).
    The mean is then the same two double ops on both sides.  At 100 TB the shuffle carries
    64 x n_labels partial sums per task -- constant-size state, like the
    sketch aggregates."""
    emb = table(spark, sf_dir, "embeddings", split=True)
    comp = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "comp"),
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        (F.col("comp").cast("double") * F.lit(1e9))
        .cast("long")
        .alias("c"),
    )
    return comp.groupBy("label", "dim").agg(
        (F.sum("c").cast("double") / F.lit(1e9) / F.count("*")).alias(
            "centroid_c"
        ),
        F.count("*").alias("n_vecs"),
    )


_CHUNK = 50  # tokens per chunk
_STRIDE = 25  # chunk start interval (50% overlap)


@query(
    "q_chunk_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST((s.s - 1) / {_STRIDE} AS BIGINT) AS chunk_idx,
           len(toks[s.s : s.s + {_CHUNK - 1}]) AS chunk_tokens,
           array_to_string(toks[s.s : s.s + {_CHUNK - 1}], ' ') AS chunk_text
    FROM tok,
         LATERAL (SELECT unnest(generate_series(1, len(toks), {_STRIDE}))
                  AS s) s
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping document chunking (context-window preparation): each
    doc becomes ceil(n_tokens/stride) chunks of up to _CHUNK tokens with
    50% overlap.  Tokenize once, explode the chunk-start sequence, slice
    per chunk -- all codegen array expressions, no UDF; the fan-out is
    bounded (2x the corpus at 50% overlap) and narrow, so chunking
    parallelizes with the scan and shuffles nothing.  At 100 TB this is
    the map-only stage feeding the tokenizer fleet."""
    docs = table(spark, sf_dir, "documents", split=True)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    starts = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice(F.col("toks"), F.col("s"), _CHUNK)
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / _STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


_SEQ_BUDGET = 512  # tokens per packed training sequence
_PACK_SHARDS = 8  # parallel packing shards (cluster: ~partitions)


def pack_sequences(
    tok: DataFrame,
    budget: int,
    n_shards: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy sequence packing over ``(doc_id, n_tok)``: each doc joins the
    training sequence its cumulative predecessor token count falls into.

    Packing is SHARD-LOCAL: docs are split into ``n_shards`` independent
    shards by a stable function of ``doc_id`` and each shard runs its own
    running sum, so the window is ``partitionBy(shard)`` -- ``n_shards``
    concurrent partition-local sorts, never one global sort.  At 100 TB
    set ``n_shards`` ~ the write parallelism; packing quality is
    unaffected (sequences never span shards by construction, exactly as
    production packers shard by input file).  Token counts are integers,
    so prefix sums are exact and the assignment deterministic.
    ``n_shards=1`` degenerates to the classic single-order formulation
    (the oracle twin at fixture scale).  ``seq_id`` is SHARD-LOCAL (every
    shard numbers from 0): the unique sequence key is the (shard, seq_id)
    PAIR, never seq_id alone.  ``carry`` names extra ``tok`` columns to
    pass through the window unchanged (e.g. the text payload for a
    writer), so downstream consumers need no join back.
    """
    from pyspark.sql import Window

    sharded = tok.withColumn(
        "shard", (F.col("doc_id") % n_shards).cast("bigint")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sharded.select(
        "doc_id",
        "n_tok",
        *carry,
        "shard",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget)
        .cast("bigint")
        .alias("seq_id"),
    )


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             {TX.SQL_TOKEN_COUNT.format(text='text')} AS n_tok
      FROM documents
    )
    SELECT doc_id, n_tok, shard,
           CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tok) / {_SEQ_BUDGET}) AS BIGINT) AS seq_id
    FROM tok
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local greedy sequence packing (see :func:`pack_sequences`):
    the registered plan partitions the running-sum window by a stable
    doc_id shard, so the sort is partition-local and the plan executes at
    any scale -- no empty-``partitionBy`` window over a growing input.
    The single-global-order formulation is the ``n_shards=1`` degenerate
    case, kept under test as the semantic twin at fixture scale."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", TX.token_count(F.col("text")).cast("bigint").alias("n_tok")
    )
    return pack_sequences(tok, _SEQ_BUDGET, _PACK_SHARDS)


@query(
    "q_doc_freq",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS df
    FROM tok WHERE token <> ''
    GROUP BY token
    ORDER BY df DESC, token
    LIMIT 100
    """,
)
def q_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency (the IDF precursor / inverted-index
    cardinality): distinct (doc, token) pairs -> docs-per-token counts,
    top-100.  Counts stay integers so the ranking is exact; the idf
    weight itself (ln(N/df)) is left to the consumer because libm
    rounding differs across engines.  Distinct-then-count partial-
    aggregates map-side; the top-k is TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents", split=True)
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(100)
    )


@query(
    "q_vector_math",
    oracle="""
    SELECT a.vec_id,
           CAST(a.embedding[1] AS DOUBLE) + CAST(b.embedding[1] AS DOUBLE)
             AS sum_0,
           CAST(a.embedding[2] AS DOUBLE) + CAST(b.embedding[2] AS DOUBLE)
             AS sum_1,
           CAST(a.embedding[3] AS DOUBLE) + CAST(b.embedding[3] AS DOUBLE)
             AS sum_2,
           CAST(a.embedding[4] AS DOUBLE) + CAST(b.embedding[4] AS DOUBLE)
             AS sum_3,
           list_dot_product(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)))
             AS self_dot
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def q_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise vector arithmetic (zip_with add, first 4 components
    projected to scalar columns) and self dot product -- the
    embedding-math building blocks, all JVM-side higher-order functions.
    Float operands are widened to double BEFORE any arithmetic on both
    sides, so every add/multiply is the same IEEE op cross-engine; the
    self dot product folds left-to-right in both engines (F.aggregate
    here, list_dot_product's sequential loop in DuckDB), so even the
    non-associative double sum matches bit-for-bit.

    The registered output is scalar-only: the driver canonicalizes
    results through pandas, which cannot sort/hash array-typed cells, so
    the zip_with sum surfaces as four element columns rather than the
    raw array (the array-valued form remains the operator API)."""
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("va")
    )
    b = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    joined = a.join(b, "vec_id")
    dot = F.aggregate(
        F.zip_with("va", "va", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vsum = F.zip_with("va", "vb", lambda x, y: x + y)
    return joined.select(
        "vec_id",
        *[
            F.element_at(vsum, i + 1).alias(f"sum_{i}")
            for i in range(4)
        ],
        dot.alias("self_dot"),
    )


@query(
    "q_explode_outer",
    oracle="""
    SELECT d.doc_id, t.tok AS long_token
    FROM documents d LEFT JOIN LATERAL (
      SELECT unnest(list_filter(string_split(d.text, ' '),
                                x -> length(x) > 6)) AS tok) t ON TRUE
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-preserving explode (explode_outer / LEFT JOIN LATERAL unnest):
    documents with NO long tokens still emit one NULL row, so downstream
    per-document aggregates keep full corpus coverage -- plain explode
    silently drops them, the classic fan-out footgun.  Same narrow
    codegen'd generate node as explode, just with the outer flag."""
    docs = table(spark, sf_dir, "documents")
    long_toks = F.filter(
        F.split(F.col("text"), " "), lambda t: F.length(t) > 6
    )
    return docs.select(
        "doc_id", F.explode_outer(long_toks).alias("long_token")
    )


_JACCARD_T = 0.6


@query(
    "q_dedup_verified",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents)
    SELECT p.id_a, p.id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM pairs p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b ON b.doc_id = p.id_b
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= {_JACCARD_T}
    """,
)
def q_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE fuzzy-dedup flow in one plan: MinHash signatures ->
    LSH band buckets -> candidate pairs -> exact n-gram Jaccard
    verification -> threshold.  LSH keeps the pair space near-linear;
    the exact verify touches only candidates, so the expensive shingle
    comparison runs on ~0.1% of the quadratic pair space.  This is the
    operator a training pipeline actually calls; q_minhash_pairs /
    q_ngram_jaccard exist to oracle-check its two halves in isolation."""
    docs = table(spark, sf_dir, "documents", split=True)
    pairs = DD.minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN
    )
    verified = DD.jaccard_pairs(
        docs, pairs, "doc_id", "text", shingle_n=_SHN
    )
    return verified.filter(F.col("jaccard") >= _JACCARD_T).select(
        "id_a", "id_b", "jaccard"
    )


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
    ), groups AS (
      SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id
    ), q AS (
      SELECT doc_id, {TX.SQL_QUALITY_SCORE.format(text='text')} AS quality
      FROM (
        SELECT doc_id,
               CAST({TX.SQL_TOKEN_COUNT.format(text='text')} AS DOUBLE) AS n_tok,
               CAST({TX.SQL_STOPWORD_COUNT.format(text='text')} AS DOUBLE) AS n_stop,
               text
        FROM documents)
    )
    SELECT g.doc_id, g.group_id, q.quality,
           ROW_NUMBER() OVER (
             PARTITION BY group_id ORDER BY quality DESC, g.doc_id) = 1
             AS keep
    FROM groups g JOIN q USING (doc_id)
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production fuzzy-dedup DECISION, end-to-end: MinHash-LSH
    candidates -> connected components -> keep the highest-QUALITY doc
    per near-dup cluster (quality desc, doc_id tie-break) instead of the
    arbitrary min-id -- curators keep the best copy, not the first one.
    Composes the clustering (via the dup-heavy production twin
    ``DD.near_dup_groups`` -- the keep-best decision is precisely the
    crawl-dedup flow where duplicate multiplicity dominates) and
    q_quality_score into one plan; the keep argmax is a window over
    clusters (bounded by near-dup group size), so the added cost over
    clustering alone is one bounded-partition window and a quality
    expression scan."""
    docs = table(spark, sf_dir, "documents", split=True)
    groups = DD.near_dup_groups(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN
    )
    quality = docs.select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    joined = groups.join(quality, "doc_id")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return joined.select(
        "doc_id",
        "group_id",
        "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )


@query(
    "q_embed_standardize",
    oracle="""
    WITH comp AS (
      SELECT vec_id, i.i AS dim,
             CAST(trunc(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT) AS c
      FROM embeddings,
           (SELECT unnest(generate_series(1, 64)) AS i) i),
    st AS (
      SELECT dim,
             CAST(SUM(c) AS DOUBLE) / 1e6 / COUNT(*) AS mean,
             sqrt(CAST(SUM(c * c) AS DOUBLE) / 1e12 / COUNT(*)
                  - (CAST(SUM(c) AS DOUBLE) / 1e6 / COUNT(*))
                    * (CAST(SUM(c) AS DOUBLE) / 1e6 / COUNT(*))) AS std
      FROM comp GROUP BY dim)
    SELECT comp.vec_id, comp.dim,
           (CAST(c AS DOUBLE) / 1e6 - mean) / std AS z
    FROM comp JOIN st USING (dim)
    """,
)
def q_embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding standardization (z-score feature scaling):
    the whitening step before distance-based retrieval / clustering when
    dimensions have wildly different variances.  Two-pass: per-dim
    (mean, std) from exact sums, then a broadcast join back onto the
    component stream.

    Determinism: components quantize to TRUNCATED integer micro-units
    (the q_label_centroid treatment) so SUM(c) and SUM(c*c) are exact
    int64 and order-independent; mean/variance are then the identical
    double-op sequence on both engines, and sqrt is IEEE
    correctly-rounded, so z matches bit-for-bit.  Scale shape: the stats
    aggregate carries 64 constant-size partials per task, the stats table
    is dimension-sized (broadcast), and the z projection is a narrow map
    -- at 100 TB swap the int64 sums for DECIMAL(38,0) to keep SUM(c*c)
    overflow-safe past ~1e18."""
    emb = table(spark, sf_dir, "embeddings", split=True)
    comp = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        (F.col("x").cast("double") * F.lit(1e6)).cast("long").alias("c"),
    )
    stats = comp.groupBy("dim").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count("*").alias("n"),
    )
    mean = F.col("s").cast("double") / F.lit(1e6) / F.col("n")
    std = F.sqrt(
        F.col("ss").cast("double") / F.lit(1e12) / F.col("n") - mean * mean
    )
    st = stats.select("dim", mean.alias("mean"), std.alias("std"))
    return comp.join(F.broadcast(st), "dim").select(
        "vec_id",
        "dim",
        (
            (F.col("c").cast("double") / F.lit(1e6) - F.col("mean"))
            / F.col("std")
        ).alias("z"),
    )


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, {_SQL_VD} AS vd FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             round({_sql_cosine('q.vd', 'c.vd')}, 6) AS cosine
      FROM v q JOIN v c ON q.vec_id < {_NQ} AND c.label <> q.label)
    SELECT query_id, query_label, cand_id, cand_label, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM scored)
    WHERE rank <= {_TOPK}
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most similar vectors carrying a DIFFERENT label --
    the pairs that teach an embedding model the most (easy negatives are
    already far away).

    Scale shape: same skeleton as q_cosine_topk -- the query set
    broadcasts, per-row norms are precomputed so only the dot product
    runs in the pair loop, the label-mismatch filter drops same-label
    pairs before ranking, and the per-query top-k is a rank-limited
    window (WindowGroupLimit).  At 100 TB the brute-force candidate
    generator swaps for the LSH/IVF bucketed path exactly as documented
    for q_knn_label; the mining filter and ranking are unchanged."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb,
        k=_TOPK,
        carry_col="label",
        exclude="carry",
    ).select(
        "query_id", "query_label", "cand_id", "cand_label",
        "cosine", "rank",
    )


@query(
    "q_ngram_containment",
    oracle=f"""
    SELECT id_a, id_b,
           CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(sa)
             AS containment_a,
           CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(sb)
             AS containment_b
    FROM ({_SQL_PAIR_FROM})
    """,
)
def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment C(A,B) = |A∩B| / |A| on candidate
    pairs -- the dedup verifier that catches doc-in-doc duplication
    (quotations, article + commentary, re-posts with boilerplate added)
    which symmetric Jaccard misses: a short doc fully contained in a
    long one scores near-zero Jaccard but containment 1.0.  Broder's
    containment measure, the second verify metric alongside
    q_ngram_jaccard.

    Scale shape: identical to q_ngram_jaccard -- shingle arrays join to
    the candidate list only (adjacent ids as the deterministic fixture
    generator; production uses q_minhash_pairs candidates), per-pair
    array intersection is bounded by doc length, and each containment is
    a single double division of exact integers."""
    joined = _shingle_candidate_pairs(spark, sf_dir)
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    return joined.select(
        "id_a",
        "id_b",
        (inter / F.size("sa")).alias("containment_a"),
        (inter / F.size("sb")).alias("containment_b"),
    )


_PAIR_CAP = 3  # fixture cap; binds (largest sf0.01 bucket is 4)


@query(
    "q_minhash_pairs_capped",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets()}
    ), kept AS (
      SELECT doc_id, band, bucket FROM (
        SELECT doc_id, band, bucket,
               COUNT(*) OVER (PARTITION BY band, bucket) AS n
        FROM buckets)
      WHERE n <= {_PAIR_CAP})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM kept a JOIN kept b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def q_minhash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form of LSH candidate generation: identical to
    q_minhash_pairs but with the hot-bucket cap ENGAGED -- (band, bucket)
    groups above the cap are boilerplate collisions (shared templates,
    exact-copy floods like the 5x scaling probe's dup-heavy corpus)
    whose pair expansion is quadratic; dropping them bounds every
    bucket's output at cap^2 while exact duplicates still pair through
    q_dedup/q_media_dedup.  The fixture cap of 3 binds (the sf0.01
    corpus has buckets of 4), so this key oracle-checks the cap
    semantics themselves, not just the uncapped path.

    r12: realized by the COLLAPSE-AWARE generator -- the r11 1000x
    probe's worst row (72x on a uniformly-duplicated corpus) was pure
    duplicate multiplicity in the direct generator's banding; banding
    one representative per distinct text with a multiplicity-weighted
    cap and expanding pairs through the class map is output-identical
    (same oracle, cap still binding) with cost tracking distinct
    content (``minhash_candidate_pairs_collapsed``)."""
    docs = table(spark, sf_dir, "documents", split=True)
    return DD.minhash_candidate_pairs_collapsed(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS,
        shingle_n=_SHN, max_bucket_size=_PAIR_CAP,
    )


_INCOMING = "src8"  # incoming-batch source for the incremental probe


def _sql_band_buckets_src() -> str:
    rows = _NH // _BANDS
    selects = []
    for b in range(_BANDS):
        cols = [f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)]
        selects.append(
            f"SELECT doc_id, source, {b} AS band, "
            f"concat_ws('_', {', '.join(cols)}) AS bucket FROM sigs"
        )
    return "\n      UNION ALL\n      ".join(selects)


@query(
    "q_incremental_dedup",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, source,
             {_sql_minhash_cols()}
      FROM (SELECT doc_id, source, {_SQL_SHINGLES} AS sh FROM documents)
    ), buckets AS (
      {_sql_band_buckets_src()}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS matched_id
      FROM (SELECT * FROM buckets WHERE source = '{_INCOMING}') n
      JOIN (SELECT * FROM buckets WHERE source <> '{_INCOMING}') i
        ON n.band = i.band AND n.bucket = i.bucket),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents),
    scored AS (
      SELECT new_id, matched_id,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM cand
      JOIN sh a ON a.doc_id = new_id
      JOIN sh b ON b.doc_id = matched_id)
    SELECT new_id, matched_id, jaccard, jaccard >= 0.5 AS is_dup FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY new_id ORDER BY jaccard DESC, matched_id) AS rn
      FROM scored)
    WHERE rn = 1
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: probe an INCOMING batch against the EXISTING
    corpus index -- the steady-state production shape (corpus-vs-itself
    LSH is only the bootstrap).  Each new doc bands with the same
    MinHash parameters as the index, candidates come from shared
    (band, bucket) cells, the exact Jaccard verifies them, and each new
    doc reports its best match plus an is_dup decision at 0.5.

    Scale shape: the index side is banded once (in production the
    (band, bucket) table is PERSISTED and only appended -- re-banding
    100 TB per incoming batch would be absurd, and this plan's index
    branch is exactly what that materialized table contains); the
    incoming batch is small by definition, so its buckets BROADCAST
    into the probe join -- the index is never shuffled.  Verification
    joins shingles only to the candidate list.  Ranking is per new doc
    (rank-limited window, WindowGroupLimit)."""
    docs = table(spark, sf_dir, "documents", split=True)
    incoming = docs.filter(F.col("source") == _INCOMING)
    index = docs.filter(F.col("source") != _INCOMING)
    newb = DD.minhash_band_buckets(
        incoming, "doc_id", "text", _NH, _BANDS, _SHN
    ).select(
        F.col("doc_id").alias("new_id"), "band", "bucket"
    )
    idxb = DD.minhash_band_buckets(
        index, "doc_id", "text", _NH, _BANDS, _SHN
    ).select(
        F.col("doc_id").alias("matched_id"), "band", "bucket"
    )
    cand = (
        idxb.join(F.broadcast(newb), ["band", "bucket"])
        .select("new_id", "matched_id")
        .distinct()
    )
    sh = docs.select(
        "doc_id", DD.shingles_col(F.col("text"), _SHN).alias("s")
    )
    scored = (
        cand.join(
            sh.select(
                F.col("doc_id").alias("new_id"), F.col("s").alias("sa")
            ),
            "new_id",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("matched_id"),
                F.col("s").alias("sb"),
            ),
            "matched_id",
        )
        .select(
            "new_id",
            "matched_id",
            (
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb")).cast("double")
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("new_id").orderBy(
        F.desc("jaccard"), F.asc("matched_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "new_id",
            "matched_id",
            "jaccard",
            (F.col("jaccard") >= 0.5).alias("is_dup"),
        )
    )
