"""Event-stream analytics example: the rollups a product/ops team runs
daily over a 100 TB event table, demonstrated on the sf0.001 sample.

    intake health check -> per-type value SLO percentiles ->
    skew-safe rollup (salted two-phase) -> conversion funnel ->
    weekly cohort retention -> streaming funnel (stateful twin)

Every batch stage is one or two narrow shuffles; the streaming stage is
O(1) state per user. Run:
    cd /root/repo && python examples/analyze_events.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("analyze-events-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vettore_spark import queries as Q

    # 1. intake health: per-column nulls + exact distincts, one aggregate
    print("== table profile (lineitem intake check) ==")
    Q.q_table_profile(spark, sf_dir).show(truncate=False)

    # 2. value SLO: exact interpolated percentiles per event type
    print("== per-type value p50/p90/p99 ==")
    Q.q_events_value_quantiles(spark, sf_dir).show()

    # 3. skew-safe rollup: event_type is a hot low-cardinality key — the
    # salted two-phase aggregate spreads each type over 16 reducers and
    # merges, with results EXACTLY equal to the plain groupBy
    print("== salted per-type rollup ==")
    Q.q_salted_event_rollup(spark, sf_dir).show()

    # 4. conversion funnel: view -> click -> purchase, per-stage
    # min-aggregates + user_id equi-joins (no stream-wide window sort)
    print("== conversion funnel ==")
    Q.q_event_funnel(spark, sf_dir).show()

    # 5. weekly cohort retention matrix
    print("== cohort retention (first 10 cells) ==")
    Q.q_user_retention(spark, sf_dir).show(10)

    # 6. the streaming twin: the same funnel as an always-on stateful
    # query (O(1) state per user, cross-micro-batch stage progression)
    print("== streaming funnel (stateful, one availableNow pass) ==")
    import tempfile

    from vettore_spark.streaming.stateful import streaming_funnel_stage

    with tempfile.TemporaryDirectory() as tmp:
        ev = (
            Q._events_ts(spark, sf_dir)
            .select("user_id", F.unix_micros("ts").alias("ts"), "event_type")
        )
        ev.coalesce(1).write.parquet(os.path.join(tmp, "b1"))
        stream = (
            spark.readStream.schema("user_id long, ts long, event_type string")
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp + "/*")
        )
        q = (
            streaming_funnel_stage(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("funnel_example")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        spark.sql(
            "SELECT stage, count(*) AS n_users FROM funnel_example "
            "GROUP BY stage ORDER BY stage"
        ).show()

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
