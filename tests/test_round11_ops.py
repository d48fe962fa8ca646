"""Round-11 operator unit tests: the cardinality contract of the
per-distinct-value window family (continuous inputs must trip the
guard, quantized/whitelisted inputs must pass through unchanged)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.profile import (
    energy_distance_two_sample,
    mann_whitney_u,
    spearman_correlation,
    wasserstein_1d,
)


def _continuous_two_group(spark, n=4000):
    """A genuinely continuous value column: n distinct doubles that no
    decimal(18,2) cast collapses (each value has a unique 2-decimal
    image too, so the cast inside energy/wasserstein does not save
    it)."""
    return spark.range(n).select(
        (F.col("id") % 2 == 0).cast("string").alias("grp"),
        (F.col("id") * 1.37 + 0.003).alias("value"),
    )


def test_guard_trips_on_continuous_input(spark):
    df = _continuous_two_group(spark)
    for fn in (mann_whitney_u, energy_distance_two_sample, wasserstein_1d):
        with pytest.raises(ValueError, match="values in"):
            fn(df, "value", "grp", "true", "false", max_distinct=1000)


def test_guard_trips_on_continuous_spearman(spark):
    df = _continuous_two_group(spark).select(
        "value", (F.col("value") * 2).alias("value2")
    )
    with pytest.raises(ValueError, match="values in"):
        spearman_correlation(df, "value", "value2", max_distinct=1000)


def test_guard_passthrough_quantized_and_none(spark):
    """Quantized domains pass under the default bound; max_distinct=None
    skips the pre-check even on continuous data (caller's contract)."""
    df = _continuous_two_group(spark, n=400).select(
        "grp", F.round("value", 0).alias("value")
    )
    row = mann_whitney_u(df, "value", "grp", "true", "false").first()
    assert row["n_a"] == 200 and row["n_b"] == 200

    cont = _continuous_two_group(spark, n=3000)
    out = wasserstein_1d(
        cont, "value", "grp", "true", "false", max_distinct=None
    ).first()
    assert out is not None


def test_mmr_diversifies_vs_pure_topk(spark):
    """On a pool with two near-identical top-relevance vectors, pure
    top-k takes both; MMR must skip the near-duplicate."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        mmr_rerank_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),            # query
        (1, [0.99, 0.14, 0.0, 0.0]),          # top rel
        (2, [0.891, 0.126, 0.0, 0.0]),        # colinear dup of 1 (sim=1)
        (3, [0.5, 0.86, 0.0, 0.0]),           # relevant, diverse
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank_topk(df, query_id=0, k=3, pool=3, lam=0.3)
    picks = [r.vec_id for r in out.orderBy("sel_order").collect()]
    # pure top-k by relevance would be [1, 2, 3]; MMR demotes the
    # exact duplicate behind the diverse pick
    assert picks == [1, 3, 2]


def test_padding_waste_planner_math(spark):
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        padding_waste_planner,
    )

    df = spark.createDataFrame(
        [("a b c",), ("a " * 200,)], "text string"
    )  # 3 tokens and 200 tokens
    out = {
        (r.strategy, r.bucket): r
        for r in padding_waste_planner(df).collect()
    }
    r = out[("pow2_16_128", 16)]
    assert (r.n_docs, r.tokens_kept, r.tokens_pad) == (1, 3, 13)
    r = out[("pow2_16_128", 128)]  # 200 tokens truncated to 128
    assert (r.tokens_kept, r.tokens_pad, r.tokens_truncated) == (128, 0, 72)


def test_script_mix_fractions(spark):
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        script_mix_profile,
    )

    df = spark.createDataFrame(
        [("s1", "abc 123 !?"), ("s2", "тест 漢字")],
        "source string, text string",
    )
    out = {r.source: r for r in script_mix_profile(df).collect()}
    r1 = out["s1"]
    assert (r1.n_latin, r1.n_digit, r1.n_space, r1.n_punct) == (3, 3, 2, 2)
    assert r1.n_other == 0
    r2 = out["s2"]
    assert (r2.n_cyrillic, r2.n_cjk, r2.n_space) == (4, 2, 1)


def test_ngram_novelty_bounds(spark):
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        ngram_novelty_by_source,
    )

    df = spark.createDataFrame(
        [
            (1, "s", "one two three four"),     # shares nothing
            (2, "s", "alpha beta gamma delta"),  # shares nothing
            (3, "t", "one two three four"),      # exact dup of 1
            (4, "t", "hi"),                      # too short for any 3-gram
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in ngram_novelty_by_source(df).collect()}
    assert out["t"].novelty == 0.0          # every gram recurs in doc 1
    assert out["s"].grams_unique_to_doc == 2  # doc 2's grams only
    assert out["t"].n_docs == 2             # short doc still counted


def test_blocking_quality_metrics(spark):
    """A corpus with one exact-duplicate pair and two unrelated docs:
    the truth set is the duplicate pair, banding must surface it
    (identical signatures share every band), and the metric algebra
    must come out exact."""
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        blocking_quality_report,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "one two three four five six seven eight"),
        (4, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = blocking_quality_report(df, threshold=0.5).first()
    assert out["n_docs"] == 4
    assert out["n_possible_pairs"] == 6
    assert out["n_true"] == 1
    assert out["n_hits"] == 1
    assert out["pair_completeness"] == 1.0
    assert out["pair_quality"] == 1.0
    # only the duplicate pair collides: 6 - 1 = 5 pairs pruned
    assert out["n_candidates"] == 1
    assert abs(out["reduction_ratio"] - (1.0 - 1.0 / 6.0)) < 1e-6
    assert out["f_score"] == 1.0


def test_blocking_quality_rejects_bad_bands(spark):
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        blocking_quality_report,
    )

    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="bands must divide"):
        blocking_quality_report(df, n_hashes=16, bands=5)


def test_heaps_law_checkpoints_exact(spark):
    """Hand-checkable corpus: 4 docs, 2 checkpoints. Doc ids 1-4 split
    into buckets {1,2} and {3,4}; types count in the bucket of their
    FIRST occurrence."""
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        heaps_law_fit,
    )

    rows = [
        (1, "a b c"),        # 3 tokens, 3 new types
        (2, "a b d d"),      # 4 tokens, 1 new type (d)
        (3, "a e"),          # 2 tokens, 1 new type (e)
        (4, "f"),            # 1 token, 1 new type (f)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["checkpoint"]: r
        for r in heaps_law_fit(df, n_checkpoints=2).collect()
    }
    assert out[1]["cum_tokens"] == 7 and out[1]["cum_types"] == 4
    assert out[2]["cum_tokens"] == 10 and out[2]["cum_types"] == 6
    # the fit is the exact 2-point log-log line
    import math

    beta = (math.log(6) - math.log(4)) / (math.log(10) - math.log(7))
    assert abs(out[1]["heaps_beta"] - round(beta, 4)) < 1e-9
    assert out[1]["heaps_beta"] == out[2]["heaps_beta"]


def test_dp_contribution_bounding_caps_users(spark):
    """One heavy user (10 rows, one group) must contribute exactly cap
    rows; light users pass through; noise is bounded-count plus a
    per-group constant."""
    from us_accidents_bigdata_pipeline_spark.operators.dq import (
        dp_contribution_bounded_counts,
    )

    rows = [(i, 1, "a") for i in range(10)] + [
        (10, 2, "a"),
        (11, 3, "b"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, grp string")
    out = {
        r["grp"]: r
        for r in dp_contribution_bounded_counts(
            df, "grp", "user_id", "event_id", cap=2, epsilon=1.0
        ).collect()
    }
    # heavy user capped at 2, light user 1 -> group a = 3
    assert out["a"]["bounded_count"] == 3
    assert out["b"]["bounded_count"] == 1
    for r in out.values():
        assert r["contribution_cap"] == 2
        # Laplace noise at scale 2 stays within ~2*ln(2^47) < 66
        assert abs(r["noisy_count"] - r["bounded_count"]) < 66.0


def test_krippendorff_alpha_known_values(spark):
    """Perfect agreement -> alpha 1; a known mixed case matches the
    hand-computed closed form."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        krippendorff_alpha_binary,
    )

    perfect = spark.createDataFrame(
        [(1, True, True, True), (2, False, False, False)],
        "i long, r1 boolean, r2 boolean, r3 boolean",
    )
    row = krippendorff_alpha_binary(perfect, "i", ["r1", "r2", "r3"]).first()
    assert row["alpha"] == 1.0 and row["n_ratings"] == 6

    # 2 items x 3 raters: item1 = (1,1,0), item2 = (0,0,0)
    # D_o = (2*1*2/2 + 0) / 6 = 1/3
    # D_e = 2*2*4 / (6*5) = 8/15 -> alpha = 1 - (1/3)/(8/15) = 0.375
    mixed = spark.createDataFrame(
        [(1, True, True, False), (2, False, False, False)],
        "i long, r1 boolean, r2 boolean, r3 boolean",
    )
    row = krippendorff_alpha_binary(mixed, "i", ["r1", "r2", "r3"]).first()
    assert row["alpha"] == 0.375


def test_krippendorff_missing_ratings(spark):
    """NULL ratings drop out; items with <2 present ratings are
    excluded entirely."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        krippendorff_alpha_binary,
    )

    df = spark.createDataFrame(
        [(1, True, True, None), (2, True, None, None)],
        "i long, r1 boolean, r2 boolean, r3 boolean",
    )
    row = krippendorff_alpha_binary(df, "i", ["r1", "r2", "r3"]).first()
    assert row["n_items"] == 1 and row["n_ratings"] == 2
    # all ratings positive -> D_e = 0 -> alpha undefined (NULL)
    assert row["alpha"] is None


def test_calinski_harabasz_two_point_clusters(spark):
    """Two tight clusters far apart -> huge CH; exact algebra checked
    against the closed form for a 4-point 1-D case."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        calinski_harabasz,
    )

    # 1-D: cluster 0 at {0, 1}, cluster 1 at {10, 11}
    rows = [
        (0, [0.0]), (0, [1.0]), (1, [10.0]), (1, [11.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    r = calinski_harabasz(df).first()
    # means 0.5 / 10.5, grand 5.5 -> B = 2*25 + 2*25 = 100
    # W = (0.25+0.25) + (0.25+0.25) = 1
    assert r["between_ss"] == 100.0 and r["within_ss"] == 1.0
    assert r["ch_index"] == round((100.0 / 1) / (1.0 / 2), 4)


def test_rbo_identical_and_disjoint(spark):
    """Identical top-k lists give the truncated-RBO ceiling 1-p^k;
    disjoint lists give 0."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        rank_biased_overlap,
    )

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "neighbor_id long, rank int"
    )
    same = rank_biased_overlap(a, a, p=0.9, k=5).first()
    assert same["n_common"] == 5
    assert abs(same["rbo"] - round(1.0 - 0.9**5, 4)) < 1e-9

    b = spark.createDataFrame(
        [(100 + i, i) for i in range(1, 6)], "neighbor_id long, rank int"
    )
    disj = rank_biased_overlap(a, b, p=0.9, k=5).first()
    assert disj["n_common"] == 0 and disj["rbo"] == 0.0


def test_davies_bouldin_two_clusters(spark):
    """1-D two-cluster case: sigma = 0.5 each, centroid distance 10
    -> every R_ij = 1/10 -> DB = 0.1."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        davies_bouldin,
    )

    rows = [(0, [0.0]), (0, [1.0]), (1, [10.0]), (1, [11.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    r = davies_bouldin(df).first()
    assert r["n_clusters"] == 2 and r["n_vectors"] == 4
    assert r["db_index"] == 0.1


def test_intra_doc_line_dedup_keep_first(spark):
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        intra_doc_line_dedup,
    )

    df = spark.createDataFrame(
        [(1, "x\ny\nx\nz\ny"), (2, "a\na\na")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in intra_doc_line_dedup(df).collect()}
    assert out[1]["text_deduped"] == "x\ny\nz"
    assert out[1]["n_lines"] == 5 and out[1]["n_dropped"] == 2
    assert out[2]["text_deduped"] == "a"
    assert out[2]["n_dropped"] == 2


def test_readability_known_text(spark):
    """'The cat sat. It ran!' -> 5 words, 2 sentences, 5 vowel groups."""
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        readability_profile,
    )

    df = spark.createDataFrame(
        [("s1", "The cat sat. It ran!")], "source string, text string"
    )
    r = readability_profile(df).first()
    assert r["n_words"] == 5 and r["n_sentences"] == 2
    assert r["n_syllables"] == 5
    wps, spw = 2.5, 1.0
    assert abs(
        r["flesch_reading_ease"]
        - round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    ) < 1e-9


def test_source_diversity_uniform_two_sources(spark):
    """Two sources with equal token mass -> entropy ln 2, effective
    sources 2, Simpson 1/2."""
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        source_diversity_profile,
    )

    df = spark.createDataFrame(
        [("a", "w x y"), ("b", "p q r")], "source string, text string"
    )
    r = source_diversity_profile(df).first()
    import math

    assert r["n_sources"] == 2 and r["total_tokens"] == 6
    assert abs(r["shannon_entropy"] - round(math.log(2), 6)) < 1e-9
    assert r["effective_sources"] == 2.0
    assert r["simpson"] == 0.5 and r["inv_simpson"] == 2.0
    assert r["top_source_share"] == 0.5


def test_banding_scurve_shapes(spark):
    """Exact duplicates (j-bucket 1.0) must always collide (identical
    signatures share every band): observed rate 1 at the top bucket,
    and theory says 1 as well."""
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        banding_scurve_empirical,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["j_bucket"]: r for r in banding_scurve_empirical(df).collect()}
    assert out[1.0]["n_pairs"] == 1 and out[1.0]["n_collided"] == 1
    assert out[1.0]["observed_rate"] == 1.0
    assert out[1.0]["theoretical_rate"] == 1.0


def test_reshard_movement_conservation(spark):
    """Flow shares sum to 1; the same-shard diagonal is exactly the
    ids whose hash mod 16 equals its mod 24."""
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        reshard_movement_report,
    )

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    rows = reshard_movement_report(df, n_from=16, n_to=24).collect()
    assert abs(sum(r["flow_share"] for r in rows) - 1.0) < 1e-6
    assert sum(r["n_rows"] for r in rows) == 1000
    for r in rows:
        assert r["moved"] == (r["shard_from"] != r["shard_to"])
    # h % 16 == h % 24 only when h % 48 has the same residue both ways:
    # some rows must stay put, most must move
    stay = sum(r["n_rows"] for r in rows if not r["moved"])
    assert 0 < stay < 500


def test_hubness_invariants(spark):
    """E[N_k] = k exactly when every vector has k valid neighbors;
    histogram masses sum to n; the cap guard trips."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        hubness_profile,
    )
    import math
    import random

    random.seed(7)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(4)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hubness_profile(df, k=3, max_rows=None).collect()
    assert sum(r["n_vectors"] for r in out) == 20
    assert out[0]["mean_k_occurrence"] == 3.0
    mass = sum(r["k_occurrence"] * r["n_vectors"] for r in out)
    assert mass == 60  # n*k

    with pytest.raises(ValueError, match="quadratic-tier cap"):
        hubness_profile(df, k=3, max_rows=10)


def test_temperature_sweep_limits(spark):
    """tau=1 reproduces raw shares; large tau flattens toward uniform
    (entropy increases monotonically with tau for a skewed mixture)."""
    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        temperature_sweep_plan,
    )

    df = spark.createDataFrame(
        [("a", "w " * 90), ("b", "w " * 10)], "source string, text string"
    )
    rows = temperature_sweep_plan(
        df, temperatures=(1.0, 2.0, 100.0)
    ).collect()
    by = {(r["temperature"], r["source"]): r for r in rows}
    assert by[(1.0, "a")]["weight"] == 0.9
    assert by[(1.0, "b")]["weight"] == 0.1
    # tau=100 ~ uniform
    assert abs(by[(100.0, "a")]["weight"] - 0.5) < 0.01
    ents = [by[(t, "a")]["entropy"] for t in (1.0, 2.0, 100.0)]
    assert ents[0] < ents[1] < ents[2]


def test_consistent_vs_mod_movement(spark):
    """HRW must move far fewer rows than mod on a +1 resize, and both
    measured fractions must land near their expectations."""
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        consistent_vs_mod_reshard,
    )

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    rows = {r["scheme"]: r for r in consistent_vs_mod_reshard(df).collect()}
    assert rows["hrw"]["n_moved"] < rows["mod"]["n_moved"]
    assert abs(rows["hrw"]["moved_fraction"] - 1 / 17) < 0.03
    assert abs(rows["mod"]["moved_fraction"] - 16 / 17) < 0.03


def test_dunn_index_two_clusters(spark):
    """1-D: clusters {0,1} and {10,11}: sigma 0.5 -> diameter 1.0,
    centroid distance 10 -> Dunn = 10."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        dunn_index,
    )

    rows = [(0, [0.0]), (0, [1.0]), (1, [10.0]), (1, [11.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    r = dunn_index(df).first()
    assert r["min_intercluster"] == 10.0
    assert r["max_intracluster"] == 1.0
    assert r["dunn_index"] == 10.0


def test_mann_kendall_monotone_series(spark):
    """Strictly increasing series: S = n(n-1)/2, z > 0; constant
    series: S = 0, all values tie -> var 0 -> z NULL."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        mann_kendall_trend,
    )

    inc = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "x int, y double"
    )
    r = mann_kendall_trend(inc).first()
    assert r["s_statistic"] == 45 and r["n_pairs"] == 45
    # var = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert r["var_s"] == 125.0
    assert abs(r["z"] - round(44 / 125**0.5, 4)) < 1e-9

    const = spark.createDataFrame(
        [(i, 7.0) for i in range(5)], "x int, y double"
    )
    r2 = mann_kendall_trend(const).first()
    assert r2["s_statistic"] == 0 and r2["var_s"] == 0.0
    assert r2["z"] is None


def test_degree_powerlaw_fit_known(spark):
    """Star graph: hub degree n-1, leaves degree 1. With d_min above
    1, only the hub is in the tail; alpha = 1 + 1/ln(hub/d_min)."""
    from us_accidents_bigdata_pipeline_spark.operators.graph import (
        degree_powerlaw_fit,
    )
    import math

    # symmetric edge list of a 6-leaf star centered at 0
    edges = [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_powerlaw_fit(df, d_min=2).first()
    assert r["n_nodes"] == 7 and r["max_degree"] == 6
    assert r["n_tail"] == 1
    assert abs(r["alpha"] - round(1 + 1 / math.log(3.0), 4)) < 1e-9


def test_loo_group_impact_algebra(spark):
    """Two groups: metric means 10 and 20 -> dropping the low group
    raises the mean; deltas have opposite signs and exact values."""
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        loo_group_impact,
    )

    rows = [("a", 10), ("a", 10), ("b", 20), ("b", 20)]
    df = spark.createDataFrame(rows, "source string, m int")
    out = {
        r["source"]: r
        for r in loo_group_impact(df, F.col("m"), "source").collect()
    }
    assert out["a"]["group_mean"] == 10.0 and out["b"]["group_mean"] == 20.0
    assert out["a"]["global_mean"] == 15.0
    assert out["a"]["loo_mean"] == 20.0 and out["a"]["delta"] == -5.0
    assert out["b"]["loo_mean"] == 10.0 and out["b"]["delta"] == 5.0


def test_split_ks_identical_distributions(spark):
    """A value column that is IDENTICAL across split sides (constant)
    gives KS 0; a column equal to the split side itself gives KS 1."""
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        split_ks_report,
        _shuffle_key,
    )

    df = spark.range(2000).select(F.col("id").alias("k"))
    side = (
        F.conv(F.substring(_shuffle_key("k", 42), 1, 8), 16, 10)
        .cast("long") % 2
    ).cast("int")
    df = df.select("k", F.lit(1.0).alias("const"), side.cast("double").alias("leak"))
    out = {r["column"]: r for r in split_ks_report(df, "k", ["const", "leak"]).collect()}
    assert out["const"]["ks_stat"] == 0.0
    assert out["leak"]["ks_stat"] == 1.0
    assert out["const"]["n_a"] + out["const"]["n_b"] == 2000


def test_dedup_growth_curve_exact(spark):
    """4 docs in 2 checkpoints, one exact dup in the second half:
    cumulative distinct lags cumulative docs by exactly the dup."""
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        dedup_growth_curve,
    )

    rows = [(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["checkpoint"]: r for r in dedup_growth_curve(df, n_checkpoints=2).collect()
    }
    assert out[1]["cum_docs"] == 2 and out[1]["cum_distinct"] == 2
    assert out[2]["cum_docs"] == 4 and out[2]["cum_distinct"] == 3
    assert out[2]["dup_fraction"] == 0.25


def test_neyman_allocation_total_and_ordering(spark):
    """Allocations sum exactly to the budget and favor the large,
    noisy stratum over the same-size constant one."""
    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        neyman_allocation,
    )

    rows = (
        [("noisy", "w " * (10 * (i % 10 + 1))) for i in range(50)]
        + [("flat", "w " * 50)] * 50
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in neyman_allocation(df, budget=1000).collect()}
    assert out["noisy"]["alloc"] + out["flat"]["alloc"] == 1000
    # flat stratum has sd 0 -> everything goes to the noisy one
    assert out["flat"]["alloc"] == 0 and out["noisy"]["alloc"] == 1000


def test_source_modularity_extremes(spark):
    """All dup pairs intra-source -> intra fraction 1 and Q = the
    maximum 1 - sum((d_s/2m)^2); a cross-source dup drops both."""
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        source_modularity,
    )

    base = "alpha beta gamma delta epsilon zeta"
    intra = spark.createDataFrame(
        [
            (1, base, "s1"), (2, base, "s1"),
            (3, "one two three four five six", "s2"),
            (4, "one two three four five six", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    r = source_modularity(intra, threshold=0.9).first()
    assert r["n_edges"] == 2 and r["intra_edge_fraction"] == 1.0
    # two sources, each with degree mass 2 of 2m=4 -> Q = 1 - 2*(1/2)^2
    assert r["modularity"] == 0.5

    cross = spark.createDataFrame(
        [(1, base, "s1"), (2, base, "s2")],
        "doc_id long, text string, source string",
    )
    r2 = source_modularity(cross, threshold=0.9).first()
    assert r2["intra_edge_fraction"] == 0.0
    assert r2["modularity"] < 0.0


def test_ratio_metric_delta_ci_sanity(spark):
    """Ratio equals total purchases over total events per arm; CI
    brackets the ratio; constant per-user behavior -> se ~ 0."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        ratio_metric_delta_ci,
    )

    # every user: 4 events, 1 purchase -> ratio exactly .25, variance 0
    rows = []
    for u in range(40):
        rows += [(u, "purchase")] + [(u, "click")] * 3
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = ratio_metric_delta_ci(
        df,
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0),
        F.lit(1),
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["ratio"] == 0.25
        assert r["se"] == 0.0
        assert r["ci_lo"] == 0.25 and r["ci_hi"] == 0.25
    assert sum(r["n_users"] for r in out) == 40
