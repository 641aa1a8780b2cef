"""CellPartitionedStore: IVF probes must become partition-pruned scans —
the storage-level half of the ANN scale story."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.sources.store import CellPartitionedStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 8)) * 5.0
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((f"v{i:03d}", (centers[c] + rng.standard_normal(8) * 0.2).tolist()))
    df = spark.createDataFrame(rows, "id: string, vector: array<double>")
    st = CellPartitionedStore(
        str(tmp_path_factory.mktemp("cells") / "coll"),
        [(i, centers[i].tolist()) for i in range(4)],
    )
    st.write(df)
    return st, centers


def test_write_partitions_by_cell(spark, store):
    st, centers = store
    df = st.read(spark)
    assert set(df.columns) == {"id", "vector", "cell"}
    # every center's points land in its own cell
    cells = {r["cell"] for r in df.select("cell").distinct().collect()}
    assert cells == {0, 1, 2, 3}
    n = df.groupBy("cell").count().collect()
    assert all(r["count"] == 50 for r in n)


def test_probe_read_prunes_partitions(spark, store):
    st, centers = store
    probed = st.probe_read(spark, centers[2].tolist(), n_probe=1)
    rows = probed.collect()
    assert len(rows) == 50
    assert all(r["cell"] == 2 for r in rows)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must be a PARTITION filter (directory pruning),
    # not a post-scan data filter
    assert "PartitionFilters: [cell#" in plan or "PartitionFilters: [isnotnull(cell" in plan or "cell" in plan[plan.index("PartitionFilters"):].splitlines()[0]
    scan = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "IN" in scan.upper() or "in(" in scan


def test_probe_read_topk_correct(spark, store):
    """Exact top-k over the probed cell equals brute force over the full
    collection when the query sits inside a well-separated cluster."""
    from vettore_spark.operators.search import flat_topk

    st, centers = store
    q = centers[1].tolist()
    pruned_top = flat_topk(
        st.probe_read(spark, q, n_probe=1), q, metric="l2", k=5
    ).collect()
    full_top = flat_topk(st.read(spark), q, metric="l2", k=5).collect()
    assert [r["id"] for r in pruned_top] == [r["id"] for r in full_top]
