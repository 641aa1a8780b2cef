"""Data-selection operators: DSIR importance weights, target-mixture
rebalance, exact-substring dedup candidates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import selection as SEL
from vettore_spark.operators.dedup import substring_gram_pairs


@pytest.fixture(scope="module")
def docs(spark):
    target_words = "alpha beta gamma delta epsilon zeta"
    other_words = "uno dos tres cuatro cinco seis"
    rows = []
    for i in range(40):
        w = target_words if i % 2 == 0 else other_words
        rows.append((i, f"{w} {w} {w}", "en" if i % 2 == 0 else "es",
                     f"src{i % 4}"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_dsir_separates_target_from_raw(docs):
    out = SEL.dsir_logratio_weights(
        docs, F.col("lang") == "en", n_buckets=256
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 40
    target_mean = sum(by_id[i]["dsir_weight"] for i in range(0, 40, 2)) / 20
    other_mean = sum(by_id[i]["dsir_weight"] for i in range(1, 40, 2)) / 20
    # target docs are built from target-only vocabulary: their log-ratio
    # must exceed the non-target docs' by construction
    assert target_mean > other_mean
    assert all(r["n_tokens"] == 18 for r in out)


def test_dsir_weight_is_tokens_times_per_token(docs):
    out = SEL.dsir_logratio_weights(docs, F.col("lang") == "en").collect()
    for r in out:
        assert r["dsir_weight"] == pytest.approx(
            r["dsir_per_token"] * r["n_tokens"], abs=2e-4 * r["n_tokens"]
        )


def test_mixture_keep_fractions_binding_domain(docs):
    shares = {"src0": 0.4, "src1": 0.2, "src2": 0.2, "src3": 0.2}
    fr = {r["domain"]: r for r in
          SEL.mixture_keep_fractions(docs, shares, domain_col="source").collect()}
    # 10 docs per domain; src0 demands 0.4 share -> binding (fraction 1.0),
    # others downsample to 0.2/0.4 * 10 / 10 = 0.5
    assert fr["src0"]["keep_fraction"] == pytest.approx(1.0)
    for d in ("src1", "src2", "src3"):
        assert fr[d]["keep_fraction"] == pytest.approx(0.5)


def test_mixture_sample_deterministic_and_bounded(docs):
    shares = {"src0": 0.4, "src1": 0.2, "src2": 0.2, "src3": 0.2}
    kept1 = SEL.mixture_sample(docs, shares, domain_col="source").collect()
    kept2 = SEL.mixture_sample(docs, shares, domain_col="source").collect()
    assert sorted(r["doc_id"] for r in kept1) == sorted(r["doc_id"] for r in kept2)
    per = {}
    for r in kept1:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per["src0"] == 10  # binding domain keeps everything
    for d in ("src1", "src2", "src3"):
        assert per.get(d, 0) <= 10


def test_mixture_zero_share_domain_dropped(docs):
    shares = {"src0": 0.5, "src1": 0.5}
    kept = SEL.mixture_sample(docs, shares, domain_col="source").collect()
    assert {r["source"] for r in kept} <= {"src0", "src1"}


def test_substring_pairs_catch_shared_run(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again padded"
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "totally different beginning " + shared),
        (3, "no overlap with anything here at all, unique words only zzz " * 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the shared run sits at DIFFERENT offsets in docs 1 and 2 — exactly
    # the case a fixed-stride gram sample misses; content-defined sampling
    # selects the same grams from the run in both docs
    out = substring_gram_pairs(df, k=40).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_substring_pairs_df_cap(spark):
    boiler = "this exact same boilerplate header repeats everywhere " * 2
    df = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    capped = substring_gram_pairs(df, k=40, max_gram_df=5).collect()
    assert capped == []  # posting list of 10 > cap 5 -> dropped
    uncapped = substring_gram_pairs(df, k=40, max_gram_df=50).collect()
    assert len(uncapped) == 45  # all C(10,2) pairs


def test_semdedup_keeps_cluster_representative(spark):
    # cluster A: three near-identical vectors + one orthogonal; cluster B
    # lives in a different subspace entirely
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], "a"),
        (2, [0.999, 0.01, 0.0, 0.0], "a"),
        (3, [0.998, 0.02, 0.0, 0.0], "a"),
        (4, [0.0, 1.0, 0.0, 0.0], "a"),
        (5, [0.0, 0.0, 1.0, 0.0], "b"),
        (6, [0.0, 0.0, 0.0, 1.0], "b"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    from pyspark.sql import functions as F
    from vettore_spark.functions import kernels as K

    cents = emb.groupBy("label").agg(
        K.mean_vector(F.collect_list("embedding"), 4).alias("mean")
    )
    out = {r["vec_id"]: r for r in
           SEL.semdedup_prune(emb, cents, threshold=0.9).collect()}
    assert len(out) == 6
    kept_a_near = [i for i in (1, 2, 3) if out[i]["kept"]]
    assert len(kept_a_near) == 1  # 1,2,3 are mutual near-dups: one survives
    assert out[4]["kept"]  # orthogonal member survives
    assert out[5]["kept"] and out[6]["kept"]  # cross-cluster never compared


def test_mixture_unmatched_shares_empty_sample(docs):
    # shares name domains that don't exist -> empty sample, no NULL poison
    kept = SEL.mixture_sample(docs, {"nosuch": 1.0}, domain_col="source")
    assert kept.count() == 0
    fr = SEL.mixture_keep_fractions(docs, {"nosuch": 1.0}, domain_col="source")
    assert all(r["keep_fraction"] == 0.0 for r in fr.collect())


def test_substring_all_docs_short_is_empty(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "also short")], "doc_id long, text string"
    )
    assert substring_gram_pairs(df, k=40).count() == 0


def test_dsir_no_target_docs_still_scores(docs):
    out = SEL.dsir_logratio_weights(docs, F.lit(False)).collect()
    assert len(out) == 40
    # with an empty target, every weight is ln(uniform/p_raw) — finite
    assert all(abs(r["dsir_weight"]) < 1e6 for r in out)


def test_curation_pipeline_composition(spark):
    """DSIR filter -> mixture rebalance composition: survivors respect both
    the importance threshold and the per-domain mixture cap."""
    from vettore_spark import queries as Q

    out = Q.q_curation_pipeline(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "curation pipeline produced no domains"
    assert all(r["n_kept"] >= 1 for r in rows)
    assert set(out.columns) == {"domain", "n_kept", "sum_doc_id"}


def test_token_budget_prefix_closed(spark):
    rows = [(i, 100, round(1.0 - i * 0.1, 5)) for i in range(10)]
    w = spark.createDataFrame(rows, "doc_id long, n_tokens long, wpt double")
    out = SEL.select_token_budget(
        w, 350, weight_col="wpt", tokens_col="n_tokens"
    ).collect()
    sel = sorted(r["doc_id"] for r in out if r["selected"])
    # 100 tokens each, budget 350 -> exactly the 3 highest-weight docs fit
    assert sel == [0, 1, 2]
    # prefix-closed: nothing after the first overflow is selected
    order = sorted(out, key=lambda r: (-r["wpt"], r["doc_id"]))
    flags = [r["selected"] for r in order]
    assert flags == sorted(flags, reverse=True)


def test_token_budget_tie_break_by_id(spark):
    rows = [(i, 100, 0.5) for i in range(5)]  # all same weight
    w = spark.createDataFrame(rows, "doc_id long, n_tokens long, wpt double")
    out = SEL.select_token_budget(
        w, 250, weight_col="wpt", tokens_col="n_tokens"
    ).collect()
    assert sorted(r["doc_id"] for r in out if r["selected"]) == [0, 1]


def test_token_budget_zero_and_huge(spark):
    rows = [(i, 10, float(i)) for i in range(4)]
    w = spark.createDataFrame(rows, "doc_id long, n_tokens long, wpt double")
    none = SEL.select_token_budget(w, 0, weight_col="wpt", tokens_col="n_tokens")
    assert not any(r["selected"] for r in none.collect())
    every = SEL.select_token_budget(w, 10**9, weight_col="wpt", tokens_col="n_tokens")
    assert all(r["selected"] for r in every.collect())


def test_calibrated_quality_zscores_within_domain(spark):
    from vettore_spark import queries as Q

    out = Q.q_calibrated_quality(spark, "/root/testdata/sf0.001").collect()
    assert out
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["z_quality"])
    for src, zs in by_src.items():
        if len(zs) > 2:
            m = sum(zs) / len(zs)
            assert abs(m) < 0.05, f"{src} z-scores not centered: {m}"


def test_mixture_binding_domain_ulp_below_one_keeps_everything(spark):
    """keep_fraction for the binding domain can land one ulp BELOW 1.0
    (21/0.07*0.07/21 = 0.9999999999999998); the keep-all guard must fire
    on the integer threshold, not the fraction — otherwise the 9-digit hex
    threshold is lpad-truncated to '10000000' and ~15/16 of the binding
    domain silently disappears."""
    assert (21 / 0.07) * 0.07 / 21 < 1.0  # the ulp trap is real
    rows = [(i, "d0") for i in range(21)] + [(100 + i, "d1") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = SEL.mixture_sample(df, {"d0": 0.07, "d1": 0.93}).collect()
    kept_d0 = [r["doc_id"] for r in kept if r["source"] == "d0"]
    assert len(kept_d0) == 21  # binding domain keeps every row


def test_mixture_sample_preserves_caller_domain_column(spark):
    """domain_col named 'domain' must survive the join (drop-by-name would
    remove the caller's column along with the broadcast side's)."""
    df = spark.createDataFrame(
        [(i, f"d{i % 2}") for i in range(20)], "doc_id long, domain string"
    )
    kept = SEL.mixture_sample(df, {"d0": 0.5, "d1": 0.5}, domain_col="domain")
    assert "domain" in kept.columns
    assert kept.count() > 0


def test_semdedup_orphan_clusters_pass_through(spark):
    """Vectors whose cluster has no centroid row must still appear in the
    output (kept=true, NULL centroid similarity), not silently vanish."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "a"), (3, [1.0, 1.0], "zz")],
        "vec_id long, embedding array<double>, label string",
    )
    cents = spark.createDataFrame(
        [("a", [0.5, 0.5])], "label string, mean array<double>"
    )
    out = {r["vec_id"]: r for r in
           SEL.semdedup_prune(emb, cents, threshold=0.99).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3]["kept"] and out[3]["cos_centroid"] is None


def test_temperature_fractions_upweight_rare_domains(spark):
    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {r["domain"]: r for r in
          SEL.temperature_fractions(df, domain_col="lang", temperature=2.0).collect()}
    # T=2: share ratio sqrt(80):sqrt(20) = 2:1 instead of raw 4:1 —
    # the small domain keeps everything, the big one is downsampled
    assert fr["small"]["keep_fraction"] == pytest.approx(1.0)
    assert fr["big"]["keep_fraction"] == pytest.approx(0.5, abs=1e-9)
    # T=1 reproduces the natural distribution: nobody is downsampled
    fr1 = {r["domain"]: r for r in
           SEL.temperature_fractions(df, domain_col="lang", temperature=1.0).collect()}
    for d in fr1:
        assert fr1[d]["keep_fraction"] == pytest.approx(1.0)
