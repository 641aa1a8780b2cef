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


def test_range_sorted_write_disjoint_file_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from vettore_spark.sources.store import range_sorted_write

    df = spark.createDataFrame(
        [(i * 7919 % 10000, f"p{i}") for i in range(5000)], "k long, payload string"
    )
    path = str(tmp_path / "ranged")
    range_sorted_write(df, path, sort_col="k", num_files=8)

    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4  # range partitioner actually split the data
    # every file covers a disjoint range -> min/max stats skip whole files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # read-back with a range predicate pushes the filter to the scan
    back = spark.read.parquet(path).filter(F.col("k") < 100)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), LessThan(k,100)]" in plan
    assert back.count() == df.filter(F.col("k") < 100).count()
