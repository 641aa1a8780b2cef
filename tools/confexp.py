"""Config A/B experiment for the round-14 optimization (guide §1 / §9):
run a representative query subset under several session-config variants,
fresh SparkSession per variant, same warmup+median protocol as bench.py.

Usage: python tools/confexp.py [variant ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

QUERIES = [
    "tpch_q21_waiting",
    "bm25_batch",
    "retrieval_eval",
    "event_funnel",
    "minhash_lsh_pairs",
    "kmv_distinct_daily",
    "charlm_quality",
    "dsir_weights",
    "curation_pipeline",
    "tfidf_top_terms",
    "flat_topk_cosine",
    "multi_query_topk",
    "hybrid_topk",
    "events_anomaly",
    "tpch_q2_mincost",
    "substring_dedup",
]

VARIANTS: dict[str, dict[str, str]] = {
    "A_current": {},
    "B_sizefirst": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    "C_shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
    },
    "D_arrow": {
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    },
    "CD_shj_arrow": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    },
    "E_all": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    },
    # r15: let AQE re-optimize the output partitioning of CACHED plans —
    # persisted derived tables built from 32-partition shuffles would
    # coalesce to size-appropriate partition counts, cutting task launches
    # in every downstream stage that scans them (guide §2.2 applied to
    # InMemoryRelation). Off by default in Spark because consumers that
    # relied on the cached partitioning may see added exchanges.
    "F_cachedpart": {
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    },
    # inverse probe once F became the library default: measure WITHOUT it
    "G_nocachedpart": {
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false",
    },
}


def run_variant(name: str, conf: dict[str, str], sf_dir: str, cpus: str) -> dict:
    # baseline = the LIBRARY's current session defaults (r15: SHJ
    # preference + hugeMethodLimit live in vettore_spark.session), so every
    # variant measures its delta against what the engine actually ships
    from vettore_spark import with_engine_defaults

    b = (
        with_engine_defaults(SparkSession.builder.master(f"local[{cpus}]"))
        .appName(f"confexp-{name}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from vettore_spark import queries as Q

    qs = Q.queries()
    try:
        qs["flat_topk_cosine"](spark, sf_dir).count()
        for t in ("documents", "lineitem", "events"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    except Exception:  # noqa: BLE001
        pass
    out = {}
    for qname in QUERIES:
        fn = qs[qname]
        try:
            fn(spark, sf_dir).count()
            samples = []
            for _ in range(5):
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(round(time.time() - t0, 3))
            out[qname] = sorted(samples)[len(samples) // 2]
        except Exception as e:  # noqa: BLE001
            out[qname] = f"FAIL {e}"
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # CONFEXP_QUERIES=a,b,c overrides the default subset (targeted A/Bs)
    override = os.environ.get("CONFEXP_QUERIES")
    if override:
        QUERIES[:] = [q.strip() for q in override.split(",") if q.strip()]
    picks = sys.argv[1:] or list(VARIANTS)
    if len(picks) > 1:
        # one variant per PROCESS: module-level persist registries would
        # otherwise leak stopped-session DataFrames into the next variant
        import subprocess

        for name in picks:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                check=False,
            )
        return
    name = picks[0]
    res = run_variant(name, VARIANTS[name], sf_dir, cpus)
    tot = sum(v for v in res.values() if isinstance(v, float))
    print(f"== {name}: total {tot:.2f}s", flush=True)
    for q, v in res.items():
        print(f"   {q:28s} {v}", flush=True)
    path = f"/tmp/confexp_{name}.json"
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
