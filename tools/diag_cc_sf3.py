#!/usr/bin/env python
"""Diagnose the sf3 CC-chain parity failures by isolating the three layers:

1. EDGE PARITY — build the >=0.2-Jaccard edge relation in BOTH engines
   (Spark ``jaccard_pairs``-equivalent used by the CC chain, DuckDB
   ``_CC_EDGE_CTES``) and diff the undirected edge sets. A mismatch here is
   an edge-semantics bug, upstream of connected components.
2. ORACLE ROUND BUDGET — round-loop the large-star/small-star contraction in
   DuckDB from the MATERIALIZED edge table (skipping the expensive posting
   join) and report the exact fixpoint round. > CC_ORACLE_ROUNDS means the
   in-SQL fixpoint assertion (r7 ADVICE) is what failed the parity run.
3. LABEL PARITY — engine component labels vs the round-loop labels.

Usage: python tools/diag_cc_sf3.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cc_diag"
    os.makedirs(work, exist_ok=True)
    edges_pq = os.path.join(work, "spark_edges.parquet")

    import duckdb

    from mta_rtf_dbt_spark.operators.graph import CC_ORACLE_ROUNDS, _CC_EDGE_CTES

    # ---- Spark side: build the CC chain's edge relation, save it ----
    if not os.path.exists(edges_pq):
        from pyspark.sql import SparkSession

        from mta_rtf_dbt_spark.operators.dedup import jaccard_pairs, shingles
        from mta_rtf_dbt_spark.session import pin_session
        from mta_rtf_dbt_spark.sources.registry import load

        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        pin_session(spark)
        spark.sparkContext.setLogLevel("ERROR")
        docs = load(spark, sf_dir, "documents")
        t0 = time.time()
        pairs = jaccard_pairs(shingles(docs, 3), threshold=0.2)
        pairs.select("doc_a", "doc_b").write.mode("overwrite").parquet(edges_pq)
        print(f"spark edges written in {time.time() - t0:.0f}s", flush=True)
        spark.stop()

    # ---- DuckDB side: edge parity + round loop from the edge table ----
    con = duckdb.connect()
    con.execute("SET threads=16")
    con.execute(f"SET temp_directory='{work}/duck_spill'")
    con.execute("SET max_temp_directory_size='50GiB'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE TABLE se AS SELECT greatest(doc_a, doc_b) u, least(doc_a, doc_b) v"
        f" FROM '{edges_pq}/*.parquet'"
    )
    n_se = con.execute("SELECT count(*) FROM se").fetchone()[0]
    print(f"spark edge set: {n_se}", flush=True)

    t0 = time.time()
    con.execute(
        "CREATE TABLE de AS "
        + _CC_EDGE_CTES
        + " SELECT DISTINCT greatest(a, b) u, least(a, b) v FROM und0 WHERE a <> b"
    )
    n_de = con.execute("SELECT count(*) FROM de").fetchone()[0]
    print(f"duck edge set: {n_de} in {time.time() - t0:.0f}s", flush=True)
    only_s = con.execute(
        "SELECT count(*) FROM (SELECT u,v FROM se EXCEPT SELECT u,v FROM de)"
    ).fetchone()[0]
    only_d = con.execute(
        "SELECT count(*) FROM (SELECT u,v FROM de EXCEPT SELECT u,v FROM se)"
    ).fetchone()[0]
    print(f"edge diff: spark-only={only_s} duck-only={only_d}", flush=True)

    # ---- round loop to the exact fixpoint ----
    con.execute("CREATE TABLE e AS SELECT DISTINCT u, v FROM de")
    n_prev = con.execute("SELECT count(*) FROM e").fetchone()[0]
    fix_round = None
    for r in range(1, 41):
        t0 = time.time()
        con.execute(
            """
CREATE TABLE e_next AS
WITH u0 AS MATERIALIZED (SELECT u a, v b FROM e UNION SELECT v, u FROM e),
lm AS (SELECT a, least(a, min(b)) m FROM u0 GROUP BY a),
ls AS MATERIALIZED (SELECT DISTINCT n.b u, mn.m v FROM u0 n JOIN lm mn USING (a)
                    WHERE n.b > n.a AND n.b <> mn.m),
so AS MATERIALIZED (SELECT DISTINCT greatest(u,v) a, least(u,v) b FROM ls),
sm AS MATERIALIZED (SELECT a, min(b) m FROM so GROUP BY a)
SELECT DISTINCT u, v FROM (
  SELECT o.b u, mn.m v FROM so o JOIN sm mn USING (a)
  UNION ALL SELECT a, m FROM sm) WHERE u <> v"""
        )
        n = con.execute("SELECT count(*) FROM e_next").fetchone()[0]
        novel = con.execute(
            "SELECT count(*) FROM (SELECT u,v FROM e_next EXCEPT SELECT u,v FROM e)"
        ).fetchone()[0]
        print(f"round {r}: edges={n} novel={novel} ({time.time() - t0:.1f}s)", flush=True)
        con.execute("DROP TABLE e")
        con.execute("ALTER TABLE e_next RENAME TO e")
        if n == n_prev and novel == 0:
            fix_round = r
            break
        n_prev = n
    print(
        f"FIXPOINT round: {fix_round} (CC_ORACLE_ROUNDS={CC_ORACLE_ROUNDS}; the"
        " assertion fails the parity run iff fixpoint > rounds)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
