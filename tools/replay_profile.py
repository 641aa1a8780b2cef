"""Streaming-gate replay profiler (r13 verdict #2/#3 evidence harness).

Two unexplained wall-time jumps in the r13 record needed attribution the
record could not provide:
  - streaming_simhash_pairs' headline row doubled (3.70 -> 8.86 s) on
    unchanged code, and the best-of-3 minimum carried no per-query map;
  - the one-time replay warmup tripled (55.5 -> 141.9 s), led by
    streaming_moment_stats at 44 s, also on unchanged code.

This script produces the quiet-host counter-evidence: a FRESH process
with the bench's exact session config, each gate's first availableNow
replay timed and broken down per micro-batch (batchId, input rows, the
engine's durationMs map — addBatch is plan execution; the rest is
state-store commit and offset bookkeeping), plus warm solo samples for
any named headline queries. Host load is stamped before and after so a
contended profile is self-labelling.

Usage:
  python tools/replay_profile.py                       # all 12 gates
  python tools/replay_profile.py streaming_moment_stats [more ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    load0 = [round(x, 2) for x in os.getloadavg()]

    from pyspark.sql import SparkSession

    from vettore_spark import with_engine_defaults

    spark = (
        with_engine_defaults(SparkSession.builder.master(f"local[{cpus}]"))
        .appName("vettore-replay-profile")
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
    wanted = sys.argv[1:] or [n for n in qs if n.startswith("streaming_")]

    report: dict[str, dict] = {}
    for name in wanted:
        t0 = time.time()
        qs[name](spark, sf_dir).count()  # first call pays the replay
        first_call = round(time.time() - t0, 3)
        warm = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            warm.append(round(time.time() - t0, 3))
        prog = Q.STREAMING_REPLAY_PROGRESS.get(name, [])
        report[name] = {
            "first_call_sec": first_call,
            "replay_sec": Q.STREAMING_REPLAY_SECONDS.get(name),
            "warm_samples_sec": warm,
            "microbatches": [
                {
                    "batchId": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "addBatch_ms": (p.get("durationMs") or {}).get("addBatch"),
                    "commitOffsets_ms": (p.get("durationMs") or {}).get(
                        "commitOffsets"
                    ),
                    "getBatch_ms": (p.get("durationMs") or {}).get("getBatch"),
                    "latestOffset_ms": (p.get("durationMs") or {}).get(
                        "latestOffset"
                    ),
                    "queryPlanning_ms": (p.get("durationMs") or {}).get(
                        "queryPlanning"
                    ),
                    "walCommit_ms": (p.get("durationMs") or {}).get(
                        "walCommit"
                    ),
                }
                for p in prog
            ],
        }
        print(
            f"# {name}: replay {report[name]['replay_sec']} s, "
            f"warm {warm}",
            file=sys.stderr,
        )

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "host_load_start": load0,
        "host_load_end": [round(x, 2) for x in os.getloadavg()],
        "replay_total_sec": round(
            sum(v["replay_sec"] or 0.0 for v in report.values()), 3
        ),
        "gates": report,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
