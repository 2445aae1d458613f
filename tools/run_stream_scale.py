#!/usr/bin/env python
"""Scale rehearsal for the streaming ingest sinks (r10 verdict item 3).

`stream_dedup_ingest` / `stream_neardup_ingest` had hash-vs-batch pytest
coverage only at toy SF; their per-batch signature builds are uncontracted,
and clone-dense scale data (the /tmp/sf3 100-clone corpus) is exactly where
an uncontracted band build would blow up. This tool drains the sf documents
table through BOTH sinks as a REAL multi-batch stream (file source,
maxFilesPerTrigger=1, id-ordered batch files) and checks, at scale:

1. `stream_dedup_ingest` corpus == the batch `exact_dedup_groups` canonical
   picks, hash-equal. (Id-ordered arrival makes streaming keep-first equal
   the batch min-doc_id-per-hash pick.)
2. `stream_neardup_ingest` corpus == a batch-mode replay of the sink's own
   documented screen rules (in-batch: drop on any band shared with a
   smaller-id batch doc; cross-batch: drop on any band shared with a
   previously-KEPT doc), computed with the same public helpers but none of
   the streaming/index/bucketed-table machinery — so the comparison
   validates exactly that machinery.
3. Exactly-once: re-offering the full stream under a fresh checkpoint
   appends nothing to either corpus.
4. Multi-batch is proven from the sink's own progress: every micro-batch's
   numInputRows is recorded in the artifact.

Usage: python tools/run_stream_scale.py [sf_dir] [n_batches] [out.json]
Defaults: /tmp/sf3, 4, rehearsals/rehearsal_stream_<tag>_r11.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _progress(q) -> list:
    """Per-micro-batch input rows from the sink's own progress (dict or
    JSON-string depending on PySpark version) — proves multi-batch drain."""
    out = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        if p["numInputRows"] > 0:
            out.append({"batch_id": p["batchId"], "rows": p["numInputRows"]})
    return out


def _sha_of_ids(df, col="doc_id") -> tuple[int, str]:
    """(count, sha256 of the sorted id list) — order-free value fingerprint."""
    import hashlib

    ids = sorted(r[0] for r in df.select(col).collect())
    h = hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()
    return len(ids), h


def _banded(spark, bdf):
    """The sink's own banding, via the same public helpers it uses."""
    from pyspark.sql import functions as F

    from mta_rtf_dbt_spark.functions import text as T
    from mta_rtf_dbt_spark.operators.dedup import (
        MINHASH_P,
        _poly_hash_col,
        lsh_band_keys,
        minhash_signatures,
    )

    sigs = minhash_signatures(bdf)
    real = lsh_band_keys(sigs, 16).select(
        "doc_id",
        (F.col("band").cast("long") * (MINHASH_P + 1) + F.col("band_hash")).alias(
            "bkey"
        ),
    )
    fallback = bdf.filter(F.size(T.tokens(T.normalize(F.col("text")))) < 3).select(
        F.col("doc_id"),
        (-_poly_hash_col(T.normalize(F.col("text"))) - 1).alias("bkey"),
    )
    return real.unionAll(fallback)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    tag = os.path.basename(sf_dir.rstrip("/"))
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "rehearsals", f"rehearsal_stream_{tag}_r11.json")
    )

    from pyspark.sql import functions as F

    from mta_rtf_dbt_spark.operators.dedup import exact_dedup_groups
    from mta_rtf_dbt_spark.session import get_spark
    from mta_rtf_dbt_spark.sources.registry import load
    from mta_rtf_dbt_spark.streaming.upsert import (
        stream_dedup_ingest,
        stream_neardup_ingest,
    )

    spark = get_spark("stream-scale-rehearsal")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    results: dict = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_batches": n_batches,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "wall_start_unix": round(time.time(), 1),
        "sinks": {},
    }

    work = tempfile.mkdtemp(prefix="stream_scale_")
    try:
        # id-ordered batch files (arrival order == id order), staggered
        # mtimes so the file source's modification-time ordering agrees
        incoming = os.path.join(work, "incoming")
        os.makedirs(incoming)
        bounds = [
            r[0]
            for r in docs.select(
                F.percentile_approx(
                    "doc_id", [i / n_batches for i in range(1, n_batches)], 10000
                )
            ).collect()
        ][0]
        edges = [None, *bounds, None]
        t0 = time.monotonic()
        for k in range(n_batches):
            lo, hi = edges[k], edges[k + 1]
            part = docs
            if lo is not None:
                part = part.filter(F.col("doc_id") > lo)
            if hi is not None:
                part = part.filter(F.col("doc_id") <= hi)
            p = os.path.join(incoming, f"b{k:02d}.parquet")
            part.toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + k, time.time() + k))
        results["stage_batches_sec"] = round(time.monotonic() - t0, 1)

        def stream():
            return (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(incoming)
            )

        # ---- exact-dedup sink ------------------------------------------
        d = {}
        corpus = os.path.join(work, "exact_corpus")
        index = os.path.join(work, "exact_index")
        t0 = time.monotonic()
        q = stream_dedup_ingest(spark, stream(), corpus, index, f"{work}/ck_e1")
        ok = q.awaitTermination(3600)
        d["drain_sec"] = round(time.monotonic() - t0, 1)
        d["drained"] = bool(ok)
        if not ok:
            q.stop()
        d["batches"] = _progress(q)
        got = spark.read.parquet(corpus)
        n_got, h_got = _sha_of_ids(got)
        want = exact_dedup_groups(load(spark, sf_dir, "documents")).select(
            F.col("canonical_doc_id").alias("doc_id")
        )
        n_want, h_want = _sha_of_ids(want)
        d["stream_rows"], d["batch_rows"] = n_got, n_want
        d["hash_equal"] = h_got == h_want
        # redelivery (fresh checkpoint): exactly-once corpus
        t0 = time.monotonic()
        q2 = stream_dedup_ingest(spark, stream(), corpus, index, f"{work}/ck_e2")
        ok2 = q2.awaitTermination(3600)
        if not ok2:
            q2.stop()
        d["redelivery_sec"] = round(time.monotonic() - t0, 1)
        d["redelivery_appended"] = spark.read.parquet(corpus).count() - n_got
        d["passed"] = bool(d["drained"] and d["hash_equal"]
                           and ok2 and d["redelivery_appended"] == 0
                           and len(d["batches"]) == n_batches)
        results["sinks"]["stream_dedup_ingest"] = d
        _dump(out_path, results)

        # ---- near-dup sink ---------------------------------------------
        d = {}
        corpus = os.path.join(work, "near_corpus")
        index = os.path.join(work, "near_index")
        t0 = time.monotonic()
        q = stream_neardup_ingest(spark, stream(), corpus, index, f"{work}/ck_n1")
        ok = q.awaitTermination(7200)
        d["drain_sec"] = round(time.monotonic() - t0, 1)
        d["drained"] = bool(ok)
        if not ok:
            q.stop()
        d["batches"] = _progress(q)
        got = spark.read.parquet(corpus)
        n_got, h_got = _sha_of_ids(got)
        # batch-mode replay of the sink's screen rules, no streaming machinery
        t0 = time.monotonic()
        kept_bands = None
        kept_n = 0
        import hashlib

        kept_hash = hashlib.sha256()
        kept_ids_all = []
        for k in range(n_batches):
            bdf = spark.read.parquet(os.path.join(incoming, f"b{k:02d}.parquet"))
            banded = _banded(spark, bdf).persist()
            banded.count()
            a, b = banded.alias("a"), banded.alias("b")
            in_batch = (
                a.join(
                    b,
                    (F.col("a.bkey") == F.col("b.bkey"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(F.col("b.doc_id").alias("doc_id"))
                .distinct()
            )
            if kept_bands is not None:
                hits = (
                    banded.join(kept_bands, "bkey", "left_semi")
                    .select("doc_id")
                    .distinct()
                )
                drops = in_batch.unionAll(hits).distinct()
            else:
                drops = in_batch
            drops = drops.persist()
            drops.count()
            surviving = banded.join(drops, "doc_id", "left_anti").persist()
            surv_ids = sorted(
                r[0] for r in surviving.select("doc_id").distinct().collect()
            )
            kept_ids_all.extend(surv_ids)
            kept_n += len(surv_ids)
            nb = surviving.select("bkey").distinct()
            kept_bands = nb if kept_bands is None else kept_bands.union(nb).distinct()
            kept_bands = kept_bands.persist()
            kept_bands.count()
            banded.unpersist()
            drops.unpersist()
        h_want = hashlib.sha256(
            ",".join(map(str, sorted(kept_ids_all))).encode()
        ).hexdigest()
        d["replay_sec"] = round(time.monotonic() - t0, 1)
        d["stream_rows"], d["batch_rows"] = n_got, kept_n
        d["hash_equal"] = h_got == h_want
        t0 = time.monotonic()
        q2 = stream_neardup_ingest(spark, stream(), corpus, index, f"{work}/ck_n2")
        ok2 = q2.awaitTermination(7200)
        if not ok2:
            q2.stop()
        d["redelivery_sec"] = round(time.monotonic() - t0, 1)
        d["redelivery_appended"] = spark.read.parquet(corpus).count() - n_got
        d["passed"] = bool(d["drained"] and d["hash_equal"]
                           and ok2 and d["redelivery_appended"] == 0
                           and len(d["batches"]) == n_batches)
        results["sinks"]["stream_neardup_ingest"] = d
    finally:
        results["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        results["total_sec"] = round(
            time.time() - results["wall_start_unix"], 1
        )
        _dump(out_path, results)
        shutil.rmtree(work, ignore_errors=True)
    n_pass = sum(1 for s in results["sinks"].values() if s.get("passed"))
    print(f"done: {n_pass}/2 sinks green -> {out_path}", flush=True)
    return 0 if n_pass == 2 else 1


def _dump(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())
