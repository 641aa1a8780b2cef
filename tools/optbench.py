"""Round-14 optimization measurement harness (guide §1).

Times a chosen subset of registry queries under the EXACT bench.py
protocol (same session configs, same per-scenario warmup, median of N
`.count()` samples) and additionally:
  - times the noop-sink action (guide §1.4) so the computation is
    measured with every column materialized, independent of count()'s
    column pruning;
  - captures `.explain("formatted")` to plans/r14/<query>_<tag>.txt —
    the committed before/after plan evidence;
  - labels each job (`setJobDescription`) per guide §1.5.

Usage:
  python tools/optbench.py <tag> [query ...]       # default: top set
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... control data/cores as in
  bench.py.  Results land in /tmp/optbench_<tag>.json and plan files in
  plans/r14/.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

DEFAULT_SET = [
    "streaming_simhash_pairs",
    "textrank_distributed",
    "substring_dedup",
    "retrieval_pipeline",
    "training_pipeline",
    "kmv_shingle_overlap",
    "semantic_dedup_pairs",
    "media_ahash_pairs",
    "event_funnel",
    "tpch_q17_bloom",
    "tpch_q21_waiting",
    "dsir_weights",
    "curation_pipeline",
    "tpch_q17_smallqty",
    "bpe_pair_stats",
    "tpch_q11_important",
    "token_budget_select",
    "kmv_distinct_daily",
    "kmv_weekly_rollup",
    "ngram_jaccard_pairs",
    "bm25_batch",
    "table_profile_sketch",
    "simhash_pairs",
    "charlm_quality",
    "embedding_neardup_blocked",
    "tpch_q15_topsupp",
    "tfidf_top_terms",
    "ann_brp_lsh_topk",
    "retrieval_eval",
    "decontaminate",
    "tpch_q2_mincost",
    "minhash_lsh_pairs",
    "minhash_dedup_against",
    "ivf_insert_search",
    "dedup_keep_best",
    "events_anomaly",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_samples = int(os.environ.get("OPTBENCH_SAMPLES", "5"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", os.environ.get("OPTBENCH_PLAN_DIR", "r15"))
    os.makedirs(plan_dir, exist_ok=True)

    from vettore_spark import with_engine_defaults

    spark = (
        with_engine_defaults(SparkSession.builder.master(f"local[{cpus}]"))
        .appName("vettore-spark-optbench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vettore_spark import queries as Q

    qs = Q.queries()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # session warmup identical in spirit to bench.py
    try:
        qs["flat_topk_cosine"](spark, sf_dir).count()
        for t in ("documents", "lineitem", "events"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    except Exception:  # noqa: BLE001
        pass

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        try:
            spark.sparkContext.setJobDescription(f"optbench:{name}:warmup")
            df = fn(spark, sf_dir)
            df.count()  # warmup (streaming replay etc. lands here)
            counts = []
            for i in range(n_samples):
                spark.sparkContext.setJobDescription(f"optbench:{name}:count{i}")
                t0 = time.time()
                fn(spark, sf_dir).count()
                counts.append(round(time.time() - t0, 3))
            noops = []
            for i in range(3):
                spark.sparkContext.setJobDescription(f"optbench:{name}:noop{i}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                noops.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            n_exchange = plan.count("Exchange")
            out[name] = {
                "count_median": sorted(counts)[len(counts) // 2],
                "count_samples": counts,
                "noop_median": sorted(noops)[len(noops) // 2],
                "noop_samples": noops,
                "n_exchange": n_exchange,
            }
            print(
                f"{name:36s} count={out[name]['count_median']:7.3f} "
                f"noop={out[name]['noop_median']:7.3f} exch={n_exchange}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {e}", file=sys.stderr)
            out[name] = {"error": str(e)}
    res = {
        "tag": tag,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "replay_sec": dict(sorted(Q.STREAMING_REPLAY_SECONDS.items())),
        "queries": out,
    }
    path = f"/tmp/optbench_{tag}.json"
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
