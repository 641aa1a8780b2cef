"""Distributed-pagerank scaling harness (r9 verdict #5).

The driver tier now serves all gate-scale graphs, so the distributed
join+aggregate iteration (operators/graph.py::pagerank with
driver_max_edges=0) needs its own scale evidence:

1. iteration-time growth at 1x/16x/64x the sf0.1 token graph
   (disjoint suffixed replication — token co-occurrence over REPLICATED
   docs only grows weights, not the graph, so the graph itself is
   replicated with per-copy node suffixes: same structure, k times the
   nodes and edges),
2. durable-cut overhead at the top scale (cut_every=6 default vs 0),
3. the driver-vs-distributed crossover edge count that justifies the
   driver_max_edges=100_000 default.

Usage: cd /root/repo && python tools/pagerankbench.py
Prints one human row per measurement; paste the table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("vettore-spark-pagerankbench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vettore_spark.operators.graph import pagerank, token_adjacency
    from vettore_spark.plans import cache as PC

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = token_adjacency(docs).persist()
    e1 = base.count()
    print(f"base token graph: {e1} edges", flush=True)

    def scaled(k: int):
        parts = [
            base.select(
                F.concat_ws("_", F.col("src"), F.lit(str(i))).alias("src"),
                F.concat_ws("_", F.col("dst"), F.lit(str(i))).alias("dst"),
                "w",
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # the k-way union stacks k*32 partitions onto a table that a real
        # pipeline would read from storage at normal partition sizing —
        # left alone, 10 iterations of 512-task shuffles would measure
        # scheduler overhead, not the join+agg iteration
        return out.repartition(32).persist()

    def timed(edges, **kw) -> float:
        PC.clear()  # cold: include the out-weight join persist build
        t0 = time.time()
        pagerank(edges, weight_col="w", iters=10, **kw).count()
        return time.time() - t0

    # 1) distributed-tier growth at 1x/16x/64x
    print("\n-- distributed tier (driver_max_edges=0, iters=10, cut_every=6)")
    results: dict[int, float] = {}
    e64 = None
    for k in (1, 16, 64):
        e = scaled(k)
        n = e.count()
        dt = timed(e, driver_max_edges=0)
        results[k] = dt
        print(f"k={k:3d}  edges={n:8d}  {dt:6.2f}s", flush=True)
        if k != 64:
            e.unpersist()
        else:
            e64 = e  # reused by section 2 — do NOT rebuild (a second
            # persisted 64x copy would sit in storage through every
            # later timing)
    print(f"ratio 64x/1x = {results[64] / results[1]:.2f}x", flush=True)

    # 2) durable-cut overhead at the top scale
    t_cut = timed(e64, driver_max_edges=0, cut_every=6)
    t_nocut = timed(e64, driver_max_edges=0, cut_every=0)
    print(
        f"\n-- durable-cut overhead at 64x: cut_every=6 {t_cut:.2f}s vs "
        f"uncut {t_nocut:.2f}s ({t_cut - t_nocut:+.2f}s)",
        flush=True,
    )
    e64.unpersist()

    # 3) driver-vs-distributed crossover around the 100k default
    print("\n-- tier crossover (same graph, both tiers, iters=10)")
    for k in (8, 32, 64, 128, 256):
        e = scaled(k)
        n = e.count()
        t_drv = timed(e, driver_max_edges=10**9)
        t_dst = timed(e, driver_max_edges=0)
        win = "driver" if t_drv < t_dst else "distributed"
        print(
            f"k={k:3d}  edges={n:8d}  driver={t_drv:6.2f}s  "
            f"dist={t_dst:6.2f}s  -> {win}",
            flush=True,
        )
        e.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
