"""Unit tests for the unigram LM scorer: hand-computed smoothed log-probs on
a tiny corpus, and the ordering property the CCNet-style filter relies on
(documents of frequent tokens outscore documents of rare tokens)."""

from __future__ import annotations

import math

from mta_rtf_dbt_spark.operators.lm import lm_score, ngram_counts, unigram_model


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "the the the the"),
        (4, "zyxwvut qponmlk jihgfed"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_unigram_model_hand_computed(spark):
    docs = _docs(spark)
    model = {r.token: (r.c, r.micro_lp) for r in unigram_model(docs).collect()}
    n_total = sum(c for c, _ in model.values())
    v = len(model)
    assert n_total == 19 and model["the"][0] == 8
    expect = round(math.log((8 + 1) / (n_total + v)) * 1_000_000)
    assert model["the"][1] == expect
    expect_rare = round(math.log((1 + 1) / (n_total + v)) * 1_000_000)
    assert model["zyxwvut"][1] == expect_rare


def test_lm_score_orders_frequent_above_rare(spark):
    docs = _docs(spark)
    scores = {
        r.doc_id: r.avg_micro_lp for r in lm_score(docs, unigram_model(docs)).collect()
    }
    # doc 3 is all 'the' (most frequent token) -> highest avg log-prob;
    # doc 4 is all hapaxes -> lowest
    assert scores[3] > scores[1] and scores[3] > scores[2]
    assert scores[4] < scores[1] and scores[4] < scores[2]


def test_ngram_counts_topk_deterministic(spark):
    docs = _docs(spark)
    top = ngram_counts(docs, 2, 3).collect()
    assert [r.gram for r in top][0] == "the the"  # 3 occurrences in doc 3
    counts = [r.c for r in top]
    assert counts == sorted(counts, reverse=True)
