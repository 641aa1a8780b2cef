"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship hybrid retrieve-then-rerank query at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query for the correctness gate.

Implementation lives in the vettore_spark package; this file is the thin
driver-facing facade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vettore_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid (quantized + funnel) retrieve-then-rerank
    top-10 over the sf0.001 embeddings table."""
    return Q.q_hybrid_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
