"""Round-12 optimization pins: the restructured shingle builder and the
shared-subtree materialization must preserve semantics and the improved
plan shape (OPTIMIZATION_r12.md)."""

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.dedup import (
    _doc_shingles,
    _positional_grams,
    _shared,
    minhash_banded_pairs,
)


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "a b"),
            (4, "a b c"),
            (5, "a  b \t c d"),
            (6, "x y z x y z x y z"),
        ],
        "doc_id int, text string",
    )


def test_doc_shingles_matches_positional_formulation(spark):
    # the array formulation must be row-identical to the positional
    # (posexplode + lead window) formulation it replaced, including
    # NULL text, empty text, short docs and repeated shingles
    docs = _edge_docs(spark)
    for n in (2, 3, 5):
        new = _doc_shingles(docs, "doc_id", "text", n)
        old = (
            _positional_grams(docs, "doc_id", "text", n)
            .select("doc_id", F.col("gram").alias("shingle"))
            .distinct()
        )
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0


def test_doc_shingles_plan_is_map_only_before_distinct(spark):
    # the optimization's point: shingle GENERATION carries no window
    # and no extra exchange — the only exchange is the distinct; and
    # the let-bound token array keeps exactly ONE regex split in the
    # plan (an inlined split would re-execute per generated shingle)
    docs = _edge_docs(spark)
    plan = (
        _doc_shingles(docs, "doc_id", "text", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert plan.count("split(trim(") == 1, plan
    assert plan.count("Exchange") <= 1, plan


def test_shared_subtree_is_computed_once(spark):
    # _shared must collapse the N-consumer re-derivation: the banded
    # pair query's plan re-read the corpus 12x before; with the shared
    # shingle/signature frames the parquet scan appears in no consumer
    # branch (all branches read the one checkpointed RDD)
    docs = _edge_docs(spark).filter(F.col("text").isNotNull())
    plan = (
        minhash_banded_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_shared_preserves_rows(spark):
    docs = _edge_docs(spark)
    sh = _doc_shingles(docs, "doc_id", "text", 3)
    a = sorted(map(tuple, sh.collect()))
    b = sorted(map(tuple, _shared(sh).collect()))
    assert a == b


def test_unit_normalized_matches_inline_form(spark):
    # the let-bound norm must divide by bit-identical values
    from us_accidents_bigdata_pipeline_spark.functions import l2_norm
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        _unit_normalized,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.1, -0.2, 0.0][:2]), (3, [1e-8, 2.5])],
        "vec_id int, embedding array<double>",
    )
    new = _unit_normalized(df, "embedding").select("vec_id", "_unit")
    old = df.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x / l2_norm("embedding"),
        ).alias("_unit"),
    )
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_brp_buckets_deterministic_and_layout_independent(spark):
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        _brp_bucket_udf,
    )

    rows = [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(8)]) for i in range(40)]
    udf = _brp_bucket_udf(16, 1.0, seed=42)
    out = {}
    for nparts in (1, 7):
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        ).repartition(nparts)
        out[nparts] = {
            r["vec_id"]: tuple(r["b"])
            for r in df.select(
                "vec_id", udf(F.col("embedding")).alias("b")
            ).collect()
        }
        assert all(len(b) == 16 for b in out[nparts].values())
    assert out[1] == out[7]


def test_lsh_ann_batch_verified_equals_brute_force(spark):
    # the native candidate stage must keep recall complete so the
    # exact re-rank output equals cosine_topk_batch (the standing
    # recall assertion the oracle enforces at every SF)
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        cosine_topk_batch,
        lsh_ann_batch_verified,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 5)
    got = sorted(map(tuple, lsh_ann_batch_verified(e, qs, k=5).collect()))
    exact = sorted(map(tuple, cosine_topk_batch(e, qs, k=5).collect()))
    assert got == exact


def test_quality_and_repetition_tokenize_once_when_bound(spark):
    # the funnel's annotate pass previously executed split(trim(text))
    # 10x per doc (inline expressions; HOFs don't subexpression-
    # eliminate). With the let-bound token array the plan carries
    # exactly ONE split, and values are identical.
    from us_accidents_bigdata_pipeline_spark.functions import word_tokens
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        quality_score,
        repetition_flag,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a fine day to nap"),
            (2, "word word word word word word word word word word"),
            (3, ""),
            (4, None),
            (5, "a b"),
        ],
        "doc_id int, text string",
    )
    base = docs.select("*", word_tokens("text").alias("_toks"))
    new = base.select(
        "doc_id",
        (quality_score("text", toks=F.col("_toks")) >= 0.8).alias("q"),
        (~repetition_flag("text", toks=F.col("_toks"))).alias("r"),
    )
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(trim(") == 1, plan
    old = docs.select(
        "doc_id",
        (quality_score("text") >= 0.8).alias("q"),
        (~repetition_flag("text")).alias("r"),
    )
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def _toy_edges(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1)],
        "src int, dst int",
    )


def test_graph_iteration_plans_share_edge_subtree(spark):
    # pagerank_mass / local_clustering_coefficient previously persisted
    # the edge frames but unpersisted them in `finally` BEFORE the
    # returned lazy frame executed, so each iteration level re-derived
    # the edge subtree from the source (56 scans in
    # pagerank_mass_bounded's baseline plan, 140 in
    # clustering_coef_copurchase). With _shared the final plan reads
    # only checkpointed RDDs — the derivation runs once.
    from us_accidents_bigdata_pipeline_spark.operators.graph import (
        local_clustering_coefficient,
        pagerank_mass,
    )

    e = _toy_edges(spark)
    for frame in (
        pagerank_mass(e, n_iter=3),
        local_clustering_coefficient(e),
    ):
        plan = (
            frame._jdf.queryExecution().executedPlan().toString()
        )
        assert "Scan ExistingRDD" in plan
        # every iteration consumes the SAME checkpointed inputs: the
        # toy 7-edge graph's 3-iteration mass plan stays small
        assert plan.count("Exchange") <= 25, plan.count("Exchange")


def test_pagerank_mass_matches_pre_optimization_values(spark):
    # exact integer arithmetic — the shared-subtree rewrite must not
    # change a single mass unit vs the formula computed directly
    from us_accidents_bigdata_pipeline_spark.operators.graph import (
        pagerank_mass,
    )

    e = _toy_edges(spark)
    got = {
        r["node"]: r["mass"]
        for r in pagerank_mass(e, n_iter=2, scale=10**6).collect()
    }
    # reference: same recurrence in plain python
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1)]
    nodes = sorted({n for ed in edges for n in ed})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    mass = {n: 10**6 for n in nodes}
    for _ in range(2):
        recv = {}
        for s, d in edges:
            recv[d] = recv.get(d, 0) + mass[s] // out[s]
        dang = sum(mass[n] for n in nodes if n not in out)
        share = dang // len(nodes)
        mass = {
            n: (15 * 10**6 + 85 * (recv.get(n, 0) + share)) // 100
            for n in nodes
        }
    assert got == mass


def _union_find_components(nodes, pairs):
    # reference: classic union-find → min-id canonical label per node
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    return {
        n: min(members)
        for root, members in groups.items()
        for n in members
    }


def test_resolve_components_sum_convergence_matches_union_find(spark):
    # the r12 sum-based convergence check must not terminate early:
    # a long path graph needs several propagation rounds, so a check
    # that spuriously reports "converged" (e.g. comparing NULL sums)
    # would leave mid-chain nodes mislabeled
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        resolve_components,
    )

    chain = [(i, i + 1) for i in range(10, 25)]  # 16-node path
    extra = [(30, 31), (40, 40)]  # small comp + self-loop singleton
    pairs = chain + extra
    node_ids = sorted({n for p in pairs for n in p} | {99})  # + isolate
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["canonical_id"], r["keep"])
        for r in resolve_components(nodes, edges).collect()
    }
    ref = _union_find_components(node_ids, pairs)
    assert got == {n: (c, n == c) for n, c in ref.items()}


def test_resolve_components_non_numeric_ids_use_join_fallback(spark):
    # string ids cast to DECIMAL as NULL; without the type guard the
    # sum check would see None == None and stop after one round with
    # wrong labels on any graph deeper than one hop
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        resolve_components,
    )

    pairs = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(8)]
    node_ids = sorted({n for p in pairs for n in p})
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id string")
    edges = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_components(nodes, edges).collect()
    }
    assert got == {n: "d00" for n in node_ids}


def test_blocked_hamming_banded_frame_shared(spark):
    # both join branches of the blocked-Hamming self-join consume the
    # banded frame; with _shared the signature subtree (token explode +
    # per-bit aggregates) must appear as a checkpointed RDD, not be
    # re-derived per branch
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    docs = _edge_docs(spark).filter(F.col("text").isNotNull())
    frame = simhash_near_dup_pairs(docs, max_hamming=10)
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    # the per-bit signature aggregation runs once, not once per branch
    assert plan.count("HashAggregate") <= 2, plan.count("HashAggregate")


def test_triangle_count_intersection_form(spark):
    # the r12 adjacency-intersection rewrite must count each triangle
    # exactly once — toy graph: K4 (4 triangles... C(4,3)=4), one
    # pendant edge, a duplicate + reversed duplicate edge, and a
    # disconnected 2-node component (0 triangles)
    from us_accidents_bigdata_pipeline_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(4, 5), (1, 2), (2, 1), (10, 11)]
    e = spark.createDataFrame(edges, "src int, dst int")
    assert triangle_count(e).collect()[0]["n_triangles"] == 4
    empty = spark.createDataFrame([], "src int, dst int")
    assert triangle_count(empty).collect()[0]["n_triangles"] == 0
