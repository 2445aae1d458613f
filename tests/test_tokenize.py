"""Tokenizer layer: vocab determinism, encode stats, subword reference parity."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_subword_matches_reference_and_roundtrips(spark):
    from mta_rtf_dbt_spark.operators.tokenize import greedy_encode_py, subword_encode

    # vocab with multi-char pieces + full alphabet coverage
    pieces = ["the", "qu", "ick", "brown", "fox", " ", "th", "e"]
    alphabet = list("abcdefghijklmnopqrstuvwxyz")
    vocab = {p: i for i, p in enumerate(pieces + alphabet)}
    rows = [(1, "the quick brown fox"), (2, "thequickbrownfox"), (3, ""), (4, "zzz the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: list(r.token_ids) for r in subword_encode(df, vocab).collect()}
    inv = {i: p for p, i in vocab.items()}
    for doc_id, text in rows:
        expected = greedy_encode_py(text, vocab, max(len(k) for k in vocab))
        assert out[doc_id] == expected, (doc_id, out[doc_id], expected)
        # alphabet coverage => no -1s and decode roundtrips
        assert -1 not in out[doc_id]
        assert "".join(inv[i] for i in out[doc_id]) == text


def test_vocab_ids_deterministic(spark):
    from mta_rtf_dbt_spark.operators.tokenize import build_word_vocab
    from mta_rtf_dbt_spark.sources.registry import load

    docs = load(spark, SF, "documents")
    v1 = {r.token: r.token_id for r in build_word_vocab(docs).collect()}
    v2 = {r.token: r.token_id for r in build_word_vocab(docs.repartition(5)).collect()}
    # vocab is top-k capped at 256; the sf0.001 corpus has ~31 distinct tokens,
    # so assert determinism + the cap, not an exact size
    assert v1 == v2 and 0 < len(v1) <= 256


def test_encode_oov_consistency(spark):
    from mta_rtf_dbt_spark.operators.tokenize import build_word_vocab, encode_words
    from mta_rtf_dbt_spark.sources.registry import load

    docs = load(spark, SF, "documents")
    enc = encode_words(docs, build_word_vocab(docs))
    # every doc's OOV count is bounded by its token count; totals positive
    bad = enc.filter((F.col("n_oov") > F.col("n_tokens")) | (F.col("n_tokens") <= 0))
    assert bad.count() == 0
