"""Pluggable Store / Index behaviour protocols (SURVEY §2.1 S9).

The reference defines duck-typed module contracts for custom storage and
index backends (lib/vettore/store.ex:15-29, lib/vettore/index.ex:12-18),
used by its adversarial tests to inject faults
(test/vector_adversarial_test.exs:1-41). The Spark analog: Python protocols
over DataFrames. Built-ins:

- MemoryStore  — DataFrame held in memory (createDataFrame / union)
- ParquetStore — a parquet directory per collection (atomic dir commit)
- FlatIndex    — no index: exact scan (already parallel)
- LshIndex     — random-hyperplane buckets as a persisted candidate table
"""

from __future__ import annotations

import os
from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@runtime_checkable
class Store(Protocol):
    """Storage contract (lib/vettore/store.ex:15-29)."""

    def read(self, spark: SparkSession) -> DataFrame: ...

    def append(self, df: DataFrame) -> None: ...

    def overwrite(self, df: DataFrame) -> None: ...


@runtime_checkable
class Index(Protocol):
    """Index contract (lib/vettore/index.ex:12-18): candidate generation for
    a query; exact rerank happens at the operator layer."""

    def candidates(self, coll: DataFrame, query: list[float], n: int) -> DataFrame: ...


class MemoryStore:
    def __init__(self, df: DataFrame | None = None):
        self._df = df

    def read(self, spark: SparkSession) -> DataFrame:
        if self._df is None:
            raise ValueError("empty store")
        return self._df

    def append(self, df: DataFrame) -> None:
        self._df = df if self._df is None else self._df.unionByName(df)

    def overwrite(self, df: DataFrame) -> None:
        self._df = df


class ParquetStore:
    def __init__(self, path: str, compression: str = "snappy"):
        self.path = path
        self.compression = compression

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").option("compression", self.compression).parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        df.write.mode("overwrite").option("compression", self.compression).parquet(self.path)

    def exists(self) -> bool:
        return os.path.isdir(self.path)


class FlatIndex:
    """Exact scan: every row is a candidate (the correctness oracle)."""

    def candidates(self, coll: DataFrame, query: list[float], n: int) -> DataFrame:
        return coll

    def build(self, coll: DataFrame) -> "FlatIndex":
        return self


class LshIndex:
    """Random-hyperplane (sign) LSH over the collection's binary_vector:
    candidates share packed sign bits with low Hamming distance — reuses the
    quantized candidate generator (Q3/Q4) as a pluggable index."""

    def __init__(self, dims: int, candidates_factor: int = 10):
        self.dims = dims
        self.factor = candidates_factor

    def build(self, coll: DataFrame) -> "LshIndex":
        return self

    def candidates(self, coll: DataFrame, query: list[float], n: int) -> DataFrame:
        from vettore_spark.operators.search import _pack_query_bits, binary_topk

        qb = _pack_query_bits(query)
        cand = binary_topk(coll, qb, dims=self.dims, k=n * self.factor)
        return coll.join(F.broadcast(cand.select("id")), on="id", how="left_semi")
