"""Per-action cost decomposition: Catalyst planning vs execution (r15).

Each timed bench sample is `fn(spark, sf_dir).count()`: the registry memo
returns the same ANALYZED DataFrame, but every `.count()` wraps it in a
fresh aggregate Dataset whose QueryExecution re-runs the optimizer and
physical planner over the WHOLE tree before any task runs. For the
100+-exchange composition queries the verdict suspects that driver-side
planning — not execution — dominates the flat ~0.3-0.5 s tail.

For each query this tool measures, on separate fresh count-Datasets:
  - plan_sec:  time to force `queryExecution().executedPlan()` only
               (analysis + optimization + physical planning, no jobs);
  - exec_sec:  time for `.collect()` on a Dataset whose executedPlan was
               already forced (execution + AQE re-planning only);
  - total_sec: time for `.collect()` on a completely fresh count-Dataset
               (what the bench pays per sample).
Medians of N samples each. Usage:
  python tools/plancost.py [query ...]    # default: a registry-wide sweep
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _med(s: list[float]) -> float:
    return sorted(s)[len(s) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("PLANCOST_SAMPLES", "3"))

    from vettore_spark import with_engine_defaults

    spark = (
        with_engine_defaults(SparkSession.builder.master(f"local[{cpus}]"))
        .appName("vettore-plancost")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from vettore_spark import queries as Q

    qs = Q.queries()
    names = sys.argv[1:] or list(qs)
    try:
        qs["flat_topk_cosine"](spark, sf_dir).count()
        for t in ("documents", "lineitem", "events"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    except Exception:  # noqa: BLE001
        pass

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        try:
            spark.sparkContext.setJobDescription(f"plancost:{name}")
            fn(spark, sf_dir).count()  # warmup (replay, index builds)
            plans, execs, totals = [], [], []
            for _ in range(n):
                cdf = fn(spark, sf_dir).groupBy().count()
                t0 = time.time()
                cdf._jdf.queryExecution().executedPlan()
                plans.append(time.time() - t0)
                t0 = time.time()
                cdf.collect()  # same Dataset: planning already done
                execs.append(time.time() - t0)
                cdf2 = fn(spark, sf_dir).groupBy().count()
                t0 = time.time()
                cdf2.collect()
                totals.append(time.time() - t0)
            out[name] = {
                "plan_sec": round(_med(plans), 3),
                "exec_sec": round(_med(execs), 3),
                "total_sec": round(_med(totals), 3),
            }
            print(
                f"{name:36s} plan={out[name]['plan_sec']:6.3f} "
                f"exec={out[name]['exec_sec']:6.3f} "
                f"total={out[name]['total_sec']:6.3f}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {e}", file=sys.stderr)
            out[name] = {"error": str(e)}
        finally:
            spark.sparkContext.setJobDescription(None)

    path = "/tmp/plancost.json"
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "cpus": cpus, "queries": out}, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
