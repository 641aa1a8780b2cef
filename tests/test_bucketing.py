"""Bucketed co-located joins: same-bucketed tables must join with no
Exchange on either side."""

from __future__ import annotations

from vettore_spark.sources.store import bucketed_write


def test_bucketed_join_has_no_shuffle(spark):
    from vettore_spark.plans import checks as PC

    orders = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "id % 7 AS o_custkey"
    )
    items = spark.range(0, 5000).selectExpr(
        "id % 1000 AS l_orderkey", "cast(id % 13 as double) AS l_quantity"
    )
    bucketed_write(orders, "b_orders", bucket_col="o_orderkey", n_buckets=8)
    bucketed_write(items, "b_items", bucket_col="l_orderkey", n_buckets=8)
    try:
        bo = spark.table("b_orders")
        bi = spark.table("b_items")
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bo.join(bi, bo.o_orderkey == bi.l_orderkey)
        assert joined.count() == 5000
        assert PC.shuffle_count(joined) == 0
        plan = PC.executed_plan(joined)
        assert "SortMergeJoin" in plan
        # the same join on unbucketed frames shuffles both sides
        plain = orders.join(items, orders.o_orderkey == items.l_orderkey)
        assert PC.shuffle_count(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
