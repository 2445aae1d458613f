#!/usr/bin/env python
"""Scale rehearsal of the triangle SHUFFLE-JOIN fallback (r10 verdict item 1).

``_edge_triangles`` broadcasts the oriented adjacency when its size estimate
fits ``GRAFT_ADJ_BROADCAST_MAX``; past the budget — the regime an actual
100 TB graph lives in — the same plan runs as a shuffle join whose probe
exchange carries O(sum out_deg^2) bytes. Until now that branch's only
evidence was an 8-edge monkeypatched equality test. This tool:

1. forces the fallback (env ``GRAFT_ADJ_BROADCAST_MAX=0``, set before the
   operator module's import-time read) and runs ``graph_triangles`` +
   ``graph_clustering_coeff`` at the given SF,
2. MEASURES the exchange envelope first — n_edges, max oriented out-degree,
   ``sum(out_deg^2)`` and the estimated probe bytes — and refuses to run
   (recording the envelope, exit 2) if the estimate exceeds
   ``GRAFT_TRI_MAX_EXCHANGE`` (default 60e9; the local /tmp is one host's
   disk, a cluster's aggregate shuffle store is not),
3. re-runs both entries with the broadcast budget restored IN THE SAME
   SESSION and requires hash-identical results (the same equivalence the
   unit test pins, now at scale),
4. records per-run wall time and the Spark REST API's completed-stage
   shuffle-write byte delta, so the artifact shows the fallback actually
   paid its super-linear exchange rather than silently broadcasting.

Usage: python tools/run_tri_fallback.py [sf_dir] [out.json]
Defaults: /tmp/sf10, rehearsals/rehearsal_sf10_tri_fallback_r11.json
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import urllib.request
import warnings

# Must precede the graph module import: ADJ_BROADCAST_MAX is read at import.
os.environ["GRAFT_ADJ_BROADCAST_MAX"] = "0"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_EXCHANGE = float(os.environ.get("GRAFT_TRI_MAX_EXCHANGE", 60e9))


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across completed stages (REST API)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=30
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as e:  # UI disabled / port taken — degrade to unknown
        print(f"shuffle-bytes probe failed: {e}", flush=True)
        return -1


def _result_hash(df) -> tuple[int, str]:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256(repr(rows).encode()).hexdigest()
    return len(rows), h


def _run_entry(spark, fn, sf_dir: str) -> dict:
    t0 = time.monotonic()
    sw0 = _shuffle_write_bytes(spark)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        df = fn(spark, sf_dir)
        n, h = _result_hash(df)
    sw1 = _shuffle_write_bytes(spark)
    # Final adaptive plan AFTER the action: proves which join strategy the
    # adjacency probe actually executed (at toy SF, AQE can convert the
    # un-hinted SortMergeJoin back to broadcast under its own threshold —
    # the warning alone only proves our hint was withheld).
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "rows": n,
        "sha256": h,
        "sec": round(time.monotonic() - t0, 1),
        "shuffle_write_bytes_delta": (sw1 - sw0) if sw0 >= 0 and sw1 >= 0 else None,
        "fallback_warned": any(
            "falling back to a shuffle join" in str(w.message) for w in caught
        ),
        "plan_sortmergejoin": "SortMergeJoin" in plan,
        "plan_broadcasthashjoin": "BroadcastHashJoin" in plan,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "rehearsals", "rehearsal_sf10_tri_fallback_r11.json")
    )

    from pyspark.sql import functions as F

    from mta_rtf_dbt_spark.operators import graph
    from mta_rtf_dbt_spark.session import get_spark

    spark = get_spark("tri-fallback-rehearsal")
    res: dict = {
        "sf_dir": sf_dir,
        "forced_env": {
            "GRAFT_ADJ_BROADCAST_MAX": "0",
            "GRAFT_TRI_MAX_EXCHANGE": f"{MAX_EXCHANGE:.0f}",
            "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", ""),
        },
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "wall_start_unix": round(time.time(), 1),
    }

    # ---- envelope: measure the fallback exchange before paying it -------
    t0 = time.monotonic()
    pairs = graph._copurchase_pairs(spark, sf_dir, "trifb.pairs")
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = F.expr("du < dv OR (du = dv AND u < v)")
    out_deg = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    env_row = out_deg.agg(
        F.count(F.lit(1)).alias("n_src"),
        F.max("od").alias("max_out_deg"),
        F.sum(F.col("od") * F.col("od")).alias("sum_out_deg_sq"),
    ).collect()[0]
    n_edges = pairs.count()
    # Probe row = (u, v, nb_u): one exploded row per oriented edge, each
    # carrying its source's full out-neighborhood (8 B/element) + ~40 B of
    # row overhead. Uncompressed; lz4 on the exchange typically halves it.
    est_probe_bytes = int(8 * env_row["sum_out_deg_sq"] + 40 * n_edges)
    res["envelope"] = {
        "n_edges": n_edges,
        "n_oriented_src": env_row["n_src"],
        "max_out_deg": int(env_row["max_out_deg"]),
        "sum_out_deg_sq": int(env_row["sum_out_deg_sq"]),
        "est_probe_exchange_bytes": est_probe_bytes,
        "measure_sec": round(time.monotonic() - t0, 1),
    }
    _dump(out_path, res)
    print(f"envelope: {json.dumps(res['envelope'])}", flush=True)

    if est_probe_bytes > MAX_EXCHANGE:
        res["verdict"] = (
            f"NOT RUN: estimated probe exchange {est_probe_bytes / 1e9:.1f} GB "
            f"exceeds GRAFT_TRI_MAX_EXCHANGE={MAX_EXCHANGE / 1e9:.0f} GB on this "
            "host — measured envelope recorded instead (verdict's fallback path)"
        )
        _dump(out_path, res)
        print(res["verdict"], flush=True)
        return 2

    entries = {
        "graph_triangles": graph.graph_triangles,
        "graph_clustering_coeff": graph.graph_clustering_coeff,
    }
    res["fallback"] = {}
    for name, fn in entries.items():
        res["fallback"][name] = _run_entry(spark, fn, sf_dir)
        _dump(out_path, res)
        print(f"fallback {name}: {json.dumps(res['fallback'][name])}", flush=True)

    # ---- broadcast-path replay in the same session -----------------------
    graph.ADJ_BROADCAST_MAX = 4_000_000_000
    res["broadcast"] = {}
    for name, fn in entries.items():
        res["broadcast"][name] = _run_entry(spark, fn, sf_dir)
        _dump(out_path, res)
        print(f"broadcast {name}: {json.dumps(res['broadcast'][name])}", flush=True)

    ok = True
    for name in entries:
        f, b = res["fallback"][name], res["broadcast"][name]
        match = f["sha256"] == b["sha256"] and f["rows"] == b["rows"]
        engaged = f["fallback_warned"] and not b["fallback_warned"]
        res.setdefault("checks", {})[name] = {
            "hash_identical": match,
            "fallback_engaged": engaged,
        }
        ok = ok and match and engaged
    res["passed"] = ok
    res["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    res["total_sec"] = round(time.time() - res["wall_start_unix"], 1)
    _dump(out_path, res)
    print(f"done: passed={ok} -> {out_path}", flush=True)
    return 0 if ok else 1


def _dump(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())
