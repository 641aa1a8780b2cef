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


def test_zorder_key_matches_python_morton_oracle(spark):
    """zorder_key == a Python bit-interleave over the same integer
    ranks, for every row of a 2-dim grid (including clamping)."""
    from vettore_spark.sources.store import zorder_key

    rows = [(x, y) for x in range(-5, 70, 3) for y in range(0, 130, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    bounds = [(0, 63), (0, 127)]
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key(["x", "y"], bounds, bits=6)
        ).collect()
    }

    def rank(v, lo, hi):
        v = min(max(v, lo), hi)
        return ((v - lo) * 63) // (hi - lo)

    for (x, y), z in got.items():
        rx, ry = rank(x, 0, 63), rank(y, 0, 127)
        want = 0
        for i in range(6):
            want |= ((rx >> i) & 1) << (2 * i)
            want |= ((ry >> i) & 1) << (2 * i + 1)
        assert z == want, (x, y, z, want)


def test_zorder_key_validation(spark):
    from vettore_spark.sources.store import zorder_key

    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(["x"], [(0, 1)])
    with pytest.raises(ValueError, match="match cols"):
        zorder_key(["x", "y"], [(0, 1)])
    with pytest.raises(ValueError, match="<= 62"):
        zorder_key(["x", "y"], [(0, 1), (0, 1)], bits=32)
    with pytest.raises(ValueError, match="degenerate"):
        zorder_key(["x", "y"], [(0, 0), (0, 1)])


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """Aggregate pruning property (per-file boxes are compact
    STATISTICALLY, not worst-case — a sampled range boundary can straddle
    a Morton-curve discontinuity): a 1/8-of-domain predicate on EITHER
    column intersects at most half of the z-ordered row groups' footer
    stats, while the single-column sort keeps 100% of row groups for the
    non-lead column."""
    import glob

    import pyarrow.parquet as pq

    from vettore_spark.sources.store import range_sorted_write, zorder_write

    n = 1 << 7
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(df, zdir, cols=["x", "y"], bits=7, num_files=16)
    range_sorted_write(df, sdir, sort_col="x", num_files=16)

    def kept(path, boxes):
        k = t = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                stats = {
                    rg.column(j).path_in_schema: rg.column(j).statistics
                    for j in range(rg.num_columns)
                }
                t += 1
                if all(
                    not (stats[c].max < lo or stats[c].min > hi)
                    for c, (lo, hi) in boxes.items()
                ):
                    k += 1
        return k, t

    slab = (3 * n // 8, 4 * n // 8)  # middle 1/8 of the domain
    # each dim alone: z-order prunes SOME row groups; the single sort
    # prunes zero for its non-lead column
    for col in ("x", "y"):
        k, t = kept(zdir, {col: slab})
        assert k < t, (col, k, t)
    k, t = kept(sdir, {"y": slab})
    assert k == t  # the single-sort blind spot
    # the 2-dim box: strong pruning (the layout's headline property) —
    # ideal is 4/16 regions; the slab crosses a cell boundary in both
    # dims, so allow the straddle files on top
    k, t = kept(zdir, {"x": slab, "y": slab})
    assert k <= t // 2, (k, t)


def test_q6_zorder_table_prunes_box_and_matches_plain_q6(spark):
    """The gated tpch_q6_zorder contract end-to-end at sf0.001: the
    clustered copy's footer stats skip row groups for Q6's box predicate
    (the natural one-file layout cannot skip anything), and the query
    over the clustered files returns plain Q6's revenue bit-for-bit."""
    import datetime
    import glob

    import pyarrow.parquet as pq

    from vettore_spark import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    path = Q._zordered_lineitem_path(spark, sf_dir)

    lo_d, hi_d = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    kept = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            stats = {
                rg.column(j).path_in_schema: rg.column(j).statistics
                for j in range(rg.num_columns)
            }
            total += 1
            sd, disc = stats["l_shipdate"], stats["l_discount"]
            if not (sd.max < lo_d or sd.min >= hi_d) and not (
                disc.max < 0.05 or disc.min > 0.07
            ):
                kept += 1
    assert kept < total, (kept, total)

    plain = Q.q_tpch_q6(spark, sf_dir).first()["revenue"]
    clustered = Q.q_tpch_q6_zorder(spark, sf_dir).first()["revenue"]
    assert clustered == plain
