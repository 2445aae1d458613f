"""Tokenization operators — the token-counting / vocab layer of a
training-data pipeline (extends textops.py's regex token counting with an
actual id-assigning encode).

Three layers, decreasing SQL-expressibility:

1. **Vocab building** (`build_word_vocab`) — top-K corpus words by
   (count DESC, token ASC): one tokenize + one hash agg + one top-K.
   Fully oracle-checked.
2. **Word-level encode** (`encode_words`) — explode words, broadcast-join
   the vocab, aggregate ids/OOV stats. Pure Column ops (the scale path:
   a vocab is ~100k rows → broadcast; the corpus never shuffles).
   Fully oracle-checked.
3. **Greedy subword encode** (`subword_encode`) — longest-prefix-first
   matching with single-char fallback (the BPE-inference shape). Inherently
   iterative per position → Arrow-batched pandas UDF over a broadcast
   vocab dict; verified in tests against a pure-Python reference, invariant:
   decode(encode(x)) == x when the vocab covers the alphabet.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mta_rtf_dbt_spark.functions import text as T
from mta_rtf_dbt_spark.session import pin_session
from mta_rtf_dbt_spark.sources.registry import load, spread

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

VOCAB_K = 256


def q(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE[name] = sql
        return wrapped

    return deco


def build_word_vocab(docs: DataFrame, k: int = VOCAB_K, text_col: str = "text") -> DataFrame:
    """(token, token_id, n_occurrences): top-k corpus words; ids assigned in
    (count DESC, token ASC) order so the mapping is total-order deterministic."""
    words = docs.select(
        F.explode(T.tokens(T.normalize(F.col(text_col)))).alias("token")
    ).filter(F.col("token") != "")
    counts = words.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return (
        counts.withColumn("token_id", F.row_number().over(w) - 1)
        .filter(F.col("token_id") < k)
        .select("token", "token_id", "n_occurrences")
    )


def encode_words(docs: DataFrame, vocab: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_oov, id_sum): word-level encode via broadcast
    vocab join. id_sum is an order-free integer checksum of the assigned ids
    (exact on any engine), standing in for the id sequence in aggregates."""
    words = spread(docs).select(
        "doc_id", F.posexplode(T.tokens(T.normalize(F.col(text_col)))).alias("pos", "token")
    ).filter(F.col("token") != "")
    joined = words.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.sum(F.coalesce(F.col("token_id"), F.lit(0))).cast("long").alias("id_sum"),
    )


_TOKS = "list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), t -> t != '')"

_VOCAB_CTE = f"""
words AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS n_occurrences FROM words GROUP BY 1),
vocab AS (
  SELECT token, CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) - 1 AS INTEGER) AS token_id,
         n_occurrences
  FROM counts
  QUALIFY token_id < {VOCAB_K}
)"""


@q(
    "tokenize_vocab_topk",
    f"WITH {_VOCAB_CTE} SELECT token, token_id, n_occurrences FROM vocab",
)
def tokenize_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-256 word vocab with deterministic id assignment."""
    return build_word_vocab(load(spark, sf_dir, "documents"))


@q(
    "tokenize_encode_oov",
    f"""
    WITH {_VOCAB_CTE},
    doc_words AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(COALESCE(v.token_id, 0)) AS BIGINT) AS id_sum
    FROM doc_words d LEFT JOIN vocab v USING (token)
    GROUP BY doc_id
    """,
)
def tokenize_encode_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level encode of every document against the corpus top-256 vocab:
    token counts, OOV counts, and an order-free id checksum — the whole
    pipeline (vocab build + broadcast encode) under one oracle."""
    docs = load(spark, sf_dir, "documents")
    return encode_words(docs, build_word_vocab(docs))


# ---------------------------------------------------------------------------
# Greedy subword encode — the BPE-inference shape (pandas UDF layer).
# ---------------------------------------------------------------------------
def greedy_encode_py(text: str, vocab: dict[str, int], max_piece: int) -> list[int]:
    """Reference implementation: longest-prefix-first match; unknown single
    chars map to -1 (byte-fallback stand-in)."""
    out, i, n = [], 0, len(text)
    while i < n:
        piece = None
        for ln in range(min(max_piece, n - i), 0, -1):
            cand = text[i : i + ln]
            if cand in vocab:
                piece = cand
                break
        if piece is None:
            out.append(-1)
            i += 1
        else:
            out.append(vocab[piece])
            i += len(piece)
    return out


def subword_encode(
    df: DataFrame, vocab: dict[str, int], text_col: str = "text"
) -> DataFrame:
    """Adds ``token_ids array<int>`` + ``n_subword_tokens``. The vocab dict
    ships once per executor via broadcast variable; matching is pure Python
    per Arrow batch (the operator Columns can't express — per-position
    variable-length greedy consumption)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(vocab)
    max_piece = max((len(k) for k in vocab), default=1)

    @pandas_udf("array<int>")
    def enc(texts: pd.Series) -> pd.Series:
        v = bc.value
        return texts.map(
            lambda t: greedy_encode_py(t or "", v, max_piece)
        )

    return df.withColumn("token_ids", enc(F.col(text_col))).withColumn(
        "n_subword_tokens", F.size("token_ids")
    )
