"""Physical-plan inspection utilities — the scale guardrails.

The engine has no custom Catalyst rules (SURVEY §4: none needed for
correctness); what it has instead is a set of *plan invariants* that make
operators safe at 100 TB (bounded top-k, broadcast pruning joins, pushdown,
group-limit windows). These helpers make those invariants assertable in
tests and inspectable in notebooks:

    from vettore_spark.plans import checks as PC
    PC.assert_take_ordered(df)        # top-k is a bounded heap, not a sort
    PC.assert_no_cartesian(df)        # no accidental cross product
    PC.shuffle_count(df)              # count exchanges before shipping
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the executed plan. Every one is a
    full shuffle of its input at scale — count them before shipping an
    operator."""
    return len(re.findall(r"\bExchange\b", executed_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in executed_plan(df)


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", executed_plan(df)))


def has_cartesian(df: DataFrame) -> bool:
    p = executed_plan(df)
    return "CartesianProduct" in p


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter expressions that reached the (first) parquet scan."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
    if not m or not m.group(1).strip():
        return []
    return [f.strip() for f in m.group(1).split(",")]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verify column pruning (a scan reading all
    columns for a 2-column projection is wrong)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", executed_plan(df))


def assert_take_ordered(df: DataFrame) -> None:
    if not has_take_ordered(df):
        raise AssertionError(
            "expected TakeOrderedAndProject (bounded top-k); got:\n"
            + executed_plan(df)
        )


def assert_no_cartesian(df: DataFrame) -> None:
    if has_cartesian(df):
        raise AssertionError(
            "plan contains a CartesianProduct:\n" + executed_plan(df)
        )


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = shuffle_count(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} shuffles, expected <= {n}:\n" + executed_plan(df)
        )
