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


def _bpe_reference(word_counts: dict[str, int], n_merges: int):
    """Pure-Python Sennrich-style BPE over a word-frequency dict."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + cnt
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, a + b, n))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    from mta_rtf_dbt_spark.operators.tokenize import bpe_train

    # classic BPE corpus: overlapping runs + a merge that must compose
    # ("lo"+"w" after "l"+"o") + greedy non-overlap inside "aaaa"
    rows = [
        (1, "low low low low lower lower newest newest"),
        (2, "newest newest newest widest widest aaaa"),
        (3, "low lower lowest aaaa aaaa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wc: dict[str, int] = {}
    for _, text in rows:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
    ]
    assert got == _bpe_reference(wc, 6)
    # learned merges must include a composed (multi-char) merge by rank 6
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _, _ in got)


def test_bpe_train_partition_invariant(spark):
    from mta_rtf_dbt_spark.operators.tokenize import bpe_train
    from mta_rtf_dbt_spark.sources.registry import load

    docs = load(spark, SF, "documents")
    a = bpe_train(docs, n_merges=3).collect()
    b = bpe_train(docs.repartition(7), n_merges=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_encode_compresses(spark):
    from mta_rtf_dbt_spark.operators.tokenize import bpe_encode_corpus
    from mta_rtf_dbt_spark.sources.registry import load

    docs = load(spark, SF, "documents")
    raw = {r.doc_id: r.n_bpe_tokens for r in bpe_encode_corpus(docs, 0).collect()}
    enc = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_corpus(docs, 8).collect()
    }
    assert raw.keys() == enc.keys()
    total_raw = sum(raw.values())
    total_enc = sum(t for _, t in enc.values())
    # 8 learned merges must strictly shrink the corpus piece count, and no
    # doc can ever go below one piece per word or above its char count
    assert total_enc < total_raw
    for doc_id, (n_words, n_bpe) in enc.items():
        assert n_words <= n_bpe <= raw[doc_id]
