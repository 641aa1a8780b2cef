"""sf1.0 scale sweep (r12 verdict #7): measure the top-cost query
families at 10x the sf0.1 corpus and report per-family wall ratios.

The sf1.0 dataset is materialized ONCE under /tmp as a 10x replication
of /root/testdata/sf0.1 with consistent key shifting, DECORRELATED so
the workload scales like real data instead of degenerating:

- documents: per-replica alphabet rotation (translate) — replica texts
  are mutually dissimilar, so dedup-pair counts scale ~10x (within-
  replica structure preserved), not ~100x (every doc near-dup of its 9
  clones, an artifact no real corpus has). Replica 0 is the original.
- embeddings: per-replica deterministic perturbation keyed on
  (vec_id + dim index) — clones separate in space, neighbor structure
  stays realistic; labels repeat (clusters grow 10x in membership).
- TPC-H: every key column shifted by replica * 10M on BOTH sides of
  each join (orderkey/custkey/partkey/suppkey), so per-key fanouts are
  UNCHANGED and only cardinality grows — the real sf1.0 shape.
- events: event_id/user_id shifted (10x distinct users), ts kept (10x
  density per window — rollup group counts unchanged, rows per group
  10x).

Timing protocol mirrors bench.py: one untimed warmup then the timed
run (steady state), fresh process per scale (run this tool twice), so
table-persist memos never leak across scales.

Usage:
  python tools/sf1bench.py --gen                 # materialize /tmp sf1.0
  python tools/sf1bench.py --sf-dir /root/testdata/sf0.1
  python tools/sf1bench.py --sf-dir /tmp/vettore_sf1
Each run prints one JSON line {query: sec}; compute ratios across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/vettore_sf1"
OFFSET = 10_000_000
K = 10

# the sweep: the five top-cost families named by the r12 verdict
# (dedup pairs, blocked kNN, streaming replay, TPC-H joins, IVF/PQ
# search) plus the r13-reworked text-hashing path and a heavy rollup.
QUERIES = [
    # dedup pairs
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    # blocked kNN
    "mutual_knn_blocked",
    "embedding_neardup_blocked",
    # streaming replay (timed call includes the availableNow replay;
    # r14 adds the five replay-heavy gates the r13 verdict named —
    # their state-volume scaling was unmeasured)
    "streaming_kmv_distinct",
    "streaming_unit_dedup",
    "streaming_moment_stats",
    "streaming_simhash_pairs",
    "streaming_horizon_dedup",
    "streaming_funnel_stage",
    "streaming_topk_per_key",
    # TPC-H joins
    "tpch_q3_topk",
    "tpch_q9_profit",
    "tpch_q18_volume",
    # IVF / PQ / HNSW search tiers (build + search, cold per process)
    "ivf_filtered_topk",
    "pq_adc_topk",
    "hnsw_topk",
    # text / rollup
    "hashed_embedding",
    "tfidf_top_terms",
    "salted_event_rollup",
    "events_value_quantiles",
]

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def _rot(s: str, i: int) -> str:
    return s[i:] + s[:i]


def gen(spark: SparkSession) -> None:
    os.makedirs(DST, exist_ok=True)
    marker = os.path.join(DST, "_DONE")
    if os.path.exists(marker):
        print(f"{DST} already materialized", file=sys.stderr)
        return

    def copies(name: str, transform):
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [transform(src, i) for i in range(K)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"wrote {name}", file=sys.stderr)

    def shift(df, i, *cols):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.lit(i * OFFSET))
        return df

    copies(
        "documents",
        lambda df, i: shift(df, i, "doc_id").withColumn(
            "text",
            F.translate(
                F.col("text"), LOWER + UPPER, _rot(LOWER, i) + _rot(UPPER, i)
            ),
        ),
    )
    copies(
        "embeddings",
        lambda df, i: shift(df, i, "vec_id").withColumn(
            "embedding",
            F.expr(
                "cast(transform(embedding, (x, j) -> x + "
                f"{i} * cast(1e-4 as float) * "
                "(cast((vec_id + j) % 7 as float) - cast(3 as float))) "
                "as array<float>)"
            ),
        ),
    )
    copies("events", lambda df, i: shift(df, i, "event_id", "user_id"))
    copies(
        "lineitem",
        lambda df, i: shift(df, i, "l_orderkey", "l_partkey", "l_suppkey"),
    )
    copies("orders", lambda df, i: shift(df, i, "o_orderkey", "o_custkey"))
    copies("customer", lambda df, i: shift(df, i, "c_custkey"))
    copies("part", lambda df, i: shift(df, i, "p_partkey"))
    copies("supplier", lambda df, i: shift(df, i, "s_suppkey"))
    for name in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{name}.parquet")
        print(f"wrote {name}", file=sys.stderr)
    with open(marker, "w") as fh:
        fh.write("ok\n")


def main() -> int:
    args = sys.argv[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vettore-spark-sf1bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "--gen" in args:
        gen(spark)
        spark.stop()
        return 0

    sf_dir = SRC
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    only = [a for a in args if not a.startswith("--") and a != sf_dir]
    names = only or QUERIES

    from vettore_spark import queries as Q

    timings: dict[str, float] = {}
    for name in names:
        fn = Q._REGISTRY[name][0]
        try:
            if name.startswith("streaming_"):
                # the gate memoizes its memory-sink table per (app, sf):
                # steady-state re-count is a no-op. The scale signal is
                # the ONE-TIME availableNow replay, recorded inside
                # _run_streaming_gate on first build.
                fn(spark, sf_dir).count()
                timings[name] = Q.STREAMING_REPLAY_SECONDS[name]
            else:
                fn(spark, sf_dir).count()  # warmup (codegen, workers)
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                timings[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"{name} FAILED: {e}", file=sys.stderr)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = []
    print(json.dumps({"sf_dir": sf_dir, "host_load_end": load,
                      "timings": timings}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
