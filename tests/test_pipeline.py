"""Planted-case tests for the end-to-end curation funnel: each stage must
actively drop exactly the rows planted for it (the sf* corpus has no exact
dups, so the oracle-parity run alone can't prove the dedup stage fires)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mta_rtf_dbt_spark.operators.pipeline import curate

GOOD = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november oscar papa"
HELD = "quebec romeo sierra tango uniform victor whiskey xray yankee zulu one two three four five six"


def _docs(spark):
    rows = [
        # heldout doc (doc_id % 10 == 0)
        (10, "eval", HELD),
        # clean keepers
        (1, "srcA", GOOD),
        (2, "srcA", GOOD.replace("alpha", "zeta")),
        (3, "srcA", GOOD.replace("alpha", "theta")),
        # exact duplicate of doc 1 -> dedup drops (keep-first = doc 1)
        (7, "srcA", GOOD),
        # whitespace/case variant of doc 1 -> same normalized hash, dropped
        (9, "srcA", "  " + GOOD.upper().replace(" ", "   ") + " "),
        # low quality: 20 copies of one token (lexdiv 0.05)
        (4, "srcB", " ".join(["spam"] * 20)),
        # too short (3 tokens < MIN_TOKENS)
        (5, "srcB", "tiny doc here"),
        # contaminated: fully contains the heldout doc's text
        (6, "srcB", HELD + " plus trailing training tokens making it longer"),
        # clean srcB keeper
        (8, "srcB", GOOD.replace("bravo", "sigma")),
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_funnel_planted_cases(spark):
    stages = curate(_docs(spark), quota=2)
    q_ids = {r.doc_id for r in stages["quality"].select("doc_id").collect()}
    assert 4 not in q_ids and 5 not in q_ids  # quality filter fired
    assert {1, 7, 9} <= q_ids

    d_ids = {r.doc_id for r in stages["deduped"].select("doc_id").collect()}
    assert 1 in d_ids and 7 not in d_ids and 9 not in d_ids  # keep-first dedup

    t_ids = {r.doc_id for r in stages["train_candidates"].select("doc_id").collect()}
    assert 10 not in t_ids  # heldout excluded from training side

    c_ids = {r.doc_id for r in stages["contaminated"].collect()}
    assert c_ids == {6}  # containment vs heldout doc caught the plant

    clean_ids = {r.doc_id for r in stages["clean"].select("doc_id").collect()}
    assert 6 not in clean_ids and 8 in clean_ids

    mixed = stages["mixed"].groupBy("source").count().collect()
    assert all(r["count"] <= 2 for r in mixed)  # quota respected


def test_funnel_monotone_on_corpus(spark):
    """On real testdata each stage's survivor set is a subset of the prior
    stage (and the funnel counts are monotone non-increasing)."""
    from mta_rtf_dbt_spark.sources.registry import load

    stages = curate(load(spark, "/root/testdata/sf0.001", "documents"))
    counts = {
        k: stages[k].count()
        for k in ("base", "quality", "deduped", "train_candidates", "clean", "mixed")
    }
    order = ["base", "quality", "deduped", "train_candidates", "clean", "mixed"]
    for a, b in zip(order, order[1:]):
        assert counts[a] >= counts[b], (a, b, counts)
    assert counts["mixed"] > 0
    # shard stats grain: one row per shard, ids partition the mixed set
    from mta_rtf_dbt_spark.operators.shard import shard_plan

    plan = shard_plan(stages["mixed"])
    assert plan.count() == counts["mixed"]
    assert plan.select("doc_id").distinct().count() == counts["mixed"]


def test_curriculum_plan_orders_quality_ascending(spark):
    """The curriculum layout must emit docs in quality-bin-major order:
    walking shards by global_start, lexical-diversity bins never decrease."""
    import pyspark.sql.functions as F

    from mta_rtf_dbt_spark.functions import text as T
    from mta_rtf_dbt_spark.operators.sampling import _M
    from mta_rtf_dbt_spark.operators.shard import curriculum_key, shard_plan
    from mta_rtf_dbt_spark.sources.registry import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    key = curriculum_key(F.col("text"), F.col("doc_id"))
    plan = shard_plan(docs, key_col=key, key_max=11 * _M)
    rows = plan.select("doc_id", "shuffle_key", "global_start").orderBy("global_start").collect()
    bins = [r.shuffle_key // _M for r in rows]
    assert bins == sorted(bins)          # bin-major order
    assert len(set(bins)) > 1            # the corpus actually spans bins
    # token stream is gapless: each start = previous start + previous tokens
    starts = [r.global_start for r in rows]
    assert starts[0] == 0 and all(b > a for a, b in zip(starts, starts[1:]))
