"""Deduplication operators for large-scale training-data pipelines.

Four families over the ``documents`` table:

- **exact**        — hash-groupBy on a normalized-text sha256 (oracle-checked)
- **n-gram Jaccard** — word-shingle inverted-index join (oracle-checked);
  the scalable exact-similarity baseline
- **MinHash + LSH** — banded signature candidate generation + exact verify
  (rows-only at the driver; recall/precision asserted in tests vs the exact
  Jaccard pairs)
- **SimHash**      — 64-bit sign-hash signatures, band-join candidates +
  Hamming filter (rows-only; properties asserted in tests)

All signature math is pure Column expressions (xxhash64 / array ops inside
codegen) — no Python UDFs. Scale posture: every pair-finding path goes
through an equi-join on a bounded key (shingle, band hash) — never a cross
join; the exact-Jaccard path drops hot shingles (document frequency >=
``max_posting``, default 1000) before its self-join so one corpus-frequent
shingle can't make candidate generation quadratic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mta_rtf_dbt_spark.functions import text as T
from mta_rtf_dbt_spark.session import pin_session
from mta_rtf_dbt_spark.sources.registry import load, scoped_persist, spread

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE[name] = sql
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# Exact dedup — hash groupBy.
# ---------------------------------------------------------------------------
def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    key = F.sha2(T.normalize(F.col(text_col)), 256)
    return docs.groupBy(key.alias("content_hash")).agg(
        F.min(id_col).alias("canonical_doc_id"), F.count("*").alias("n_copies")
    )


@q(
    "dedup_exact",
    """
    SELECT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: one shuffle keyed on the content hash; survivors are the
    min doc_id per group (deterministic canonical pick)."""
    return exact_dedup_groups(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Word n-gram Jaccard — inverted-index join (the exact-similarity baseline).
# ---------------------------------------------------------------------------
def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc. Docs with < n tokens are
    dropped (mirrors the oracle's len(arr) >= n guard)."""
    docs = spread(docs)  # shingling is CPU-bound; don't let a one-row-group scan serialize it
    toks = T.tokens(T.normalize(F.col(text_col)))
    return docs.filter(F.size(toks) >= n).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(T.word_ngrams(F.col(text_col), n))).alias("shingle"),
    )


def jaccard_pairs(
    sh: DataFrame, threshold: float, max_posting: int | None = 1000
) -> DataFrame:
    """Exact Jaccard over an inverted-index self-join.

    Scale: shuffles on the shingle key only — but a corpus-frequent ("hot")
    shingle makes the posting self-join quadratic in its posting length, so
    postings with document frequency >= ``max_posting`` are dropped from the
    index first (stop-shingle cap, on by default). Semantics stay exact over
    the capped shingle universe: per-doc sizes and intersections are both
    computed post-cap, so the Jaccard value is internally consistent; a
    shingle shared by >= max_posting docs carries ~zero similarity signal
    anyway (it's corpus boilerplate). The cap's document-frequency count is
    a window over the same ``shingle`` key the self-join shuffles on, so it
    rides the same exchange. ``max_posting=None`` disables the cap."""
    if max_posting is not None:
        from pyspark.sql import Window

        dfreq = F.count("*").over(Window.partitionBy("shingle"))
        sh = sh.withColumn("__df", dfreq).filter(F.col("__df") < max_posting).drop("__df")
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@q(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') arr
                  FROM documents),
    sh0 AS (SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(arr)-2,1)),
                                   i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
           FROM toks WHERE len(arr) >= 3),
    sh AS (SELECT doc_id, shingle FROM (
             SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
             FROM sh0) WHERE df < 1000),
    cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b, ROUND(common * 1.0 / (ca.n + cb.n - common), 6) AS jaccard
    FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
    WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard baseline with the hot-shingle cap on (df < 1000,
    mirrored in the oracle SQL so parity holds even when the cap fires)."""
    return jaccard_pairs(shingles(load(spark, sf_dir, "documents"), 3), 0.2, max_posting=1000)


# ---------------------------------------------------------------------------
# MinHash + LSH — the approximate scale path.
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    shingle_rel: DataFrame | None = None,
) -> DataFrame:
    """num_hashes seeded min-hashes over word shingles, as one array column.
    Hash family: xxhash64(seed_i, shingle).

    Shape: explode shingles once, then ONE partial+final hash aggregate with
    num_hashes `min` columns — linear in total shingle count, map-side
    combined, flat codegen. (The tempting alternative — num_hashes
    `array_min(transform(shingle_array, ...))` expressions in a single
    projection — duplicates the tokenize/slice expression tree per hash and
    is orders of magnitude slower.)

    ``shingle_rel``: pass an existing (doc_id, shingle) relation to reuse a
    persisted shingle table instead of re-tokenizing the corpus.

    The variable-length shingle string is hashed ONCE to a 64-bit base value;
    the num_hashes family then re-hashes the fixed-width long (seed, h64).
    Same minhash guarantees (any universal family over the shingle set
    works), but the per-row hash cost stops scaling with num_hashes × string
    length — measured ~2× on the signature stage at sf0.1."""
    sh = shingle_rel if shingle_rel is not None else shingles(docs, shingle_n, text_col, id_col)
    pre = sh.select("doc_id", F.xxhash64(F.col("shingle")).alias("h64"))
    agg = pre.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("h64"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("minhash")
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signature, hash each band, equi-join on (band, hash). A pair
    colliding in >= 1 band is a candidate. Scale: |bands| rows per doc, one
    shuffle on the band hash — never quadratic."""
    n = 64  # signature length from minhash_signatures default
    rows_per_band = n // bands
    # band hash = one multi-arg xxhash64 over the band's raw longs — no
    # string materialization (the concat_ws(cast-to-string) alternative
    # dominated the banding stage's cost at sf0.1)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("minhash").getItem(b * rows_per_band + j)
                          for j in range(rows_per_band)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame, threshold: float = 0.2, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """Candidates via LSH, then exact-Jaccard verification of candidates only
    (the standard verify step — precision 1.0, recall set by the band curve).

    The signature and shingle relations each feed both sides of a self-join;
    persisting them (eagerly — branches of one job don't reliably share a
    cold cache) computes the shingle explode + hash agg once instead of four
    times. At cluster scale this staging is a parquet/checkpoint write."""
    sh = scoped_persist(shingles(docs, 3), "minhash.shingles")
    sh.count()  # materialize the shingle relation ONCE; signatures derive from it
    sigs = scoped_persist(
        minhash_signatures(docs, num_hashes, shingle_rel=sh), "minhash.sigs"
    )
    sigs.count()
    cands = lsh_candidate_pairs(sigs, bands)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    common = (
        cands.join(a, F.col("sa.doc_id") == F.col("doc_a"))
        .join(b, (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sa.shingle") == F.col("sb.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@q("dedup_minhash_lsh")  # rows-only: the hash family is engine-specific
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs, exact-verified. No SQL oracle (xxhash64
    family not reproducible in DuckDB); tests assert precision=1.0 and
    recall >= 0.9 against the exact Jaccard baseline."""
    return minhash_lsh_dedup(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# SimHash — Hamming-space near-dup signatures.
# ---------------------------------------------------------------------------
N_SIMHASH_BANDS = 8          # 8 bands x 8 bits: banding finds every pair
_BITS = 64 // N_SIMHASH_BANDS  # with Hamming <= N_SIMHASH_BANDS-1 (pigeonhole)


def simhash_bands(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash packed as 8x8-bit band values (band-join-ready, no
    sign-bit games). Token weights = term frequency; bit contributions summed
    per document via explode + 64 conditional sums (all codegen)."""
    docs = spread(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(T.normalize(F.col(text_col)))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
                ).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    bands = []
    for band in range(N_SIMHASH_BANDS):
        val = F.lit(0)
        for j in range(_BITS):
            bit = band * _BITS + j
            val = val + F.when(F.col(f"s{bit}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bands.append(val.alias(f"band{band}"))
    return bit_sums.select("doc_id", *bands)


def simhash_pairs(sigs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Candidates share >= 1 of 8 bands — by pigeonhole this finds *every*
    pair with Hamming <= 7, so the max_hamming=6 filter loses nothing — then
    exact Hamming distance filter."""
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(N_SIMHASH_BANDS)])
        ).alias("band", "val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(*[F.col(c).alias(f"a_{c}") for c in sigs.columns])
    sb = sigs.select(*[F.col(c).alias(f"b_{c}") for c in sigs.columns])
    ham = sum(
        F.bit_count(F.col(f"a_band{x}").bitwiseXOR(F.col(f"b_band{x}")))
        for x in range(N_SIMHASH_BANDS)
    )
    return (
        cands.join(sa, F.col("a_doc_id") == F.col("doc_a"))
        .join(sb, F.col("b_doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


@q("dedup_simhash")  # rows-only: xxhash64-based signature
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 6 over 64 bits). Tests assert the
    known exact near-dup pairs are recovered."""
    return simhash_pairs(simhash_bands(load(spark, sf_dir, "documents")))
