"""Round-11 hardening: the r10 advice items — the plan-cache zero-file
classifier's polarity (pin as never-stale ONLY for known in-memory
leaves; any other zero-file plan, e.g. a DSv2 scan, defaults to
evict-always), and the scratch-lock legacy migration guard (refuse only
on a POSITIVELY verified legacy owner — an unverifiable token must not
become a persistent spurious refusal once the flock is held)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def test_empty_dir_v2_scan_stays_evictable(spark, tmp_path):
    """r10 advice (plans/cache.py): the old classifier pinned as
    never-stale any zero-file plan whose analyzed tree did NOT print as
    a v1 `Relation [` — so a DSv2 scan (`RelationV2`) built over an
    empty dir escaped eviction forever, silently reopening the
    serve-stale-rows-after-append hole for every non-v1 read path. The
    inverted polarity (allowlist of in-memory leaf names) must give it
    the _ANY_LEAF sentinel instead."""
    from vettore_spark.plans import cache as PC

    PC.clear()
    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        d = str(tmp_path / "v2store")
        os.makedirs(d)
        src = spark.read.schema("id long").parquet(d)
        # sanity: this really is a DSv2 leaf, the shape the old regex missed
        leaves = src._jdf.queryExecution().analyzed().collectLeaves()
        names = {leaves.apply(i).nodeName() for i in range(leaves.size())}
        assert any("V2" in n for n in names), names
        first = PC.cached_persist(src, ("r11-v2",), lambda s: s.select("id"))
        assert first.count() == 0

        spark.range(4).select("id").write.mode("append").parquet(d)
        src2 = spark.read.schema("id long").parquet(d)
        assert PC.invalidate_source(src2) >= 1, (
            "empty-at-build DSv2 entry escaped leaf-overlap eviction"
        )
        fresh = PC.cached_persist(src2, ("r11-v2",), lambda s: s.select("id"))
        assert fresh.count() == 4
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)
        PC.clear()


def _claim(path: str) -> None:
    from vettore_spark.queries import _claim_scratch_dir

    _claim_scratch_dir(path)


def _release(path: str) -> None:
    from vettore_spark.queries import _OWNED_SCRATCH_FDS

    lock = path + ".lock"
    fd = _OWNED_SCRATCH_FDS.pop(lock, None)
    if fd is not None:
        os.close(fd)


def test_unverifiable_legacy_token_does_not_refuse(tmp_path):
    """r10 advice (queries.py migration guard): a lockfile token naming a
    LIVE pid with NO recorded starttime (the legacy protocol's
    /proc-less form, `<pid> 0`) used to keep `alive=True` forever — a
    reused PID turned a dead owner's never-cleared diagnostic token into
    a persistent spurious refusal even though the kernel flock was
    successfully acquired. The flock already proves no new-protocol
    owner: an unverifiable token must pass as inconclusive-dead."""
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    path = str(tmp_path / "scratch_r11a")
    try:
        with open(path + ".lock", "w") as fh:
            fh.write(f"{child.pid} 0")  # live pid, unverifiable starttime
        _claim(path)  # must NOT raise
    finally:
        _release(path)
        child.kill()
        child.wait()


def test_verified_live_legacy_owner_still_refuses(tmp_path):
    """The guard's positive side survives the polarity fix: a token whose
    (pid, starttime) POSITIVELY matches a live process still refuses."""
    from vettore_spark.queries import _proc_start_ticks

    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    path = str(tmp_path / "scratch_r11b")
    try:
        start = _proc_start_ticks(child.pid)
        if start is None:
            pytest.skip("no /proc starttime on this platform")
        with open(path + ".lock", "w") as fh:
            fh.write(f"{child.pid} {start}")
        with pytest.raises(RuntimeError, match="legacy-protocol"):
            _claim(path)
    finally:
        _release(path)
        child.kill()
        child.wait()


def test_stale_starttime_mismatch_passes(tmp_path):
    """PID reuse with a READABLE but different starttime is detected as
    dead (unchanged behavior, now via the single verified-match rule)."""
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    path = str(tmp_path / "scratch_r11c")
    try:
        with open(path + ".lock", "w") as fh:
            fh.write(f"{child.pid} 12345")  # wrong starttime: not that owner
        _claim(path)  # must NOT raise
    finally:
        _release(path)
        child.kill()
        child.wait()


def test_kmv_shingle_overlap_sketch_only_tier(spark):
    """r10 verdict watch item 2 (tier dispatch): exact=False must ship
    the sketch-only production plan — same sketch estimates as the
    calibration-tier run, no full-outer distinct-set join anywhere in
    the plan, and no exact_* columns in the output."""
    from vettore_spark.queries import q_kmv_shingle_overlap

    sf = "/root/testdata/sf0.001"
    full = q_kmv_shingle_overlap(spark, sf).collect()[0]
    sk = q_kmv_shingle_overlap(spark, sf, exact=False)
    assert sk.columns == ["jaccard", "est_union", "est_intersection"]
    plan = sk._jdf.queryExecution().optimizedPlan().toString()
    assert "FullOuter" not in plan, "sketch tier still carries the exact join"
    row = sk.collect()[0]
    assert (row["jaccard"], row["est_union"], row["est_intersection"]) == (
        full["jaccard"], full["est_union"], full["est_intersection"]
    ), "sketch estimates diverge between tiers"
