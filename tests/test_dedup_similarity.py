"""Recall/precision sanity for the non-oracle dedup & similarity paths:
MinHash-LSH, SimHash, hyperplane-LSH blocking, IVF search."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from gcf_corima_parquet_converter_spark import catalog
from gcf_corima_parquet_converter_spark.operators import dedup as D
from gcf_corima_parquet_converter_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return catalog.load(spark, sf_dir, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def mutated(spark, docs):
    """documents plus near-dup copies: 1 in 5 docs, last 2 tokens cut."""
    from gcf_corima_parquet_converter_spark.operators.text import token_count, tokens

    mut = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(tokens("text"), 1, F.greatest(token_count("text") - 2, F.lit(1))),
            " ",
        ).alias("text"),
    )
    return docs.unionByName(mut)


def test_exact_dedup_keeps_min_id(spark, docs):
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 777_000).alias("doc_id"), "text")
    )
    kept = D.exact_dedup(doubled, ["text"], "doc_id")
    assert kept.count() == docs.count()
    assert kept.agg(F.max("doc_id")).collect()[0][0] < 777_000


def test_minhash_lsh_recall(spark, mutated, docs):
    n_mut = mutated.count() - docs.count()
    pairs = D.minhash_dedup_pairs(
        mutated, "doc_id", "text", k=32, bands=8, threshold=0.5
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    truth = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in docs.where(F.col("doc_id") % 5 == 0).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall} over {n_mut} planted dups"
    # every reported pair passed exact-jaccard verification >= 0.5
    bad = pairs.where(
        F.col("n_common") < 0.5 * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    ).count()
    assert bad == 0


def test_simhash_finds_planted_dups(spark, mutated, docs):
    sig = D.simhash(mutated, "doc_id", "text")
    cand = D.simhash_candidate_pairs(sig, "doc_id").where(F.col("hamming") <= 3)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    truth = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in docs.where(F.col("doc_id") % 5 == 0).collect()
    }
    # 4x16-bit chunk blocking only *guarantees* pairs with Hamming<=3;
    # dropping 2 of ~60 tokens sometimes flips more bits, so recall is
    # expectedly below MinHash's. 0.7 is the observed floor with seed 42.
    recall = len(got & truth) / len(truth)
    assert recall >= 0.7, f"simhash recall {recall}"


def test_dedup_keep_first_resolves_pairs(spark, mutated, docs):
    pairs = D.minhash_dedup_pairs(
        mutated, "doc_id", "text", k=32, bands=8, threshold=0.5
    )
    kept = D.dedup_keep_first(pairs, mutated, "doc_id")
    # all planted near-dup copies (higher ids) are gone
    assert kept.where(F.col("doc_id") >= 1_000_000).count() <= int(
        0.1 * docs.count()
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return catalog.load(spark, sf_dir, "embeddings")


def test_lsh_bucket_blocking_vs_bruteforce(spark, emb):
    """Plant true near-dups (cos >= ~0.98) and require multi-table LSH
    blocking to find nearly all of them with zero false positives."""
    sub = emb.where(F.col("vec_id") <= 200)
    # perturbed copy: slightly scale one component — cosine stays ~1
    near = sub.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * F.lit(1.2)).otherwise(x),
        ).alias("embedding"),
        "label",
    )
    both = sub.unionByName(near)
    brute = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_near_dup_pairs(
            both, threshold=0.9, allow_brute=True
        ).collect()
    }
    bucketed = D.embedding_near_dup_pairs(
        S.with_lsh_bucket(both, n_planes=10, n_tables=4),
        threshold=0.9,
        block_col="lsh_bucket",
    )
    got = {(r["id_a"], r["id_b"]) for r in bucketed.collect()}
    assert got <= brute  # exact verify inside -> no false positives
    assert len(brute) >= 201  # the planted pairs exist
    assert len(got) / len(brute) >= 0.8, f"LSH recall {len(got)}/{len(brute)}"


def test_ivf_topk_recall(spark, emb):
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    cents = S.train_centroids_sample(emb, n_centroids=8)
    assigned = S.ivf_assign(emb, cents)
    got = [
        r["vec_id"]
        for r in S.ivf_topk(assigned, cents, qvec, k=10, n_probe=4).collect()
    ]
    overlap = len(set(exact) & set(got)) / 10
    assert overlap >= 0.5, f"IVF recall@10 {overlap}"


def test_cosine_topk_is_take_ordered(spark, emb):
    qvec = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    plan = S.cosine_topk(emb, qvec, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]


def test_dedup_similarity_plans_are_jvm_only(spark, sf_dir):
    """The 100 TB hot paths must not round-trip rows through Python:
    no BatchEvalPython / ArrowEvalPython / FlatMapsInPandas nodes."""
    from gcf_corima_parquet_converter_spark import catalog

    d = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    e = catalog.load(spark, sf_dir, "embeddings")
    qv = [0.1] * len(e.select("embedding").first()[0])
    plans = {
        "minhash": D.minhash_dedup_pairs(d, "doc_id", "text", k=8, bands=4),
        "simhash": D.simhash(d, "doc_id", "text"),
        "jaccard": D.ngram_jaccard_pairs(d, "doc_id", "text"),
        "topk": S.cosine_topk(e, qv),
        "exact": D.exact_dedup(d, ["text"], "doc_id"),
    }
    for name, df in plans.items():
        p = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
            assert marker not in p, f"{name} plan fell back to Python: {marker}"


def test_kmeans_refine_monotone_and_improves_recall(spark, emb):
    """Spherical Lloyd: the sum of max-dot assignments must not
    decrease per iteration (mean-renormalize is the exact per-cluster
    maximizer), and refined centroids must not hurt IVF recall."""
    import numpy as np

    seeds = S.train_centroids_sample(emb, n_centroids=8)
    seeds = seeds / np.linalg.norm(seeds, axis=1, keepdims=True)

    def objective(cents):
        best = F.array_max(
            F.array(*[S.dot(F.col("embedding"), S.lit_vec(c)) for c in cents])
        )
        return emb.select(F.sum(best)).first()[0]

    o0 = objective(seeds)
    c1 = S.kmeans_refine(emb, seeds, n_iter=1)
    o1 = objective(c1)
    c2 = S.kmeans_refine(emb, c1, n_iter=1)
    o2 = objective(c2)
    assert o1 >= o0 - 1e-9 and o2 >= o1 - 1e-9, (o0, o1, o2)

    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    got = [
        r["vec_id"]
        for r in S.ivf_topk(S.ivf_assign(emb, c2), c2, qvec, k=10, n_probe=4).collect()
    ]
    assert len(set(exact) & set(got)) / 10 >= 0.5


def test_ivf_save_load_roundtrip_and_pruned_probe(spark, emb, tmp_path):
    """The persisted IVF artifact must round-trip exactly (centroids +
    assignments), answer a probe identically to the in-memory index,
    and plan the probe as a PARTITION-PRUNED read of only the probed
    centroid directories — serving never repays the build."""
    seeds = S.train_centroids_sample(emb, n_centroids=8)
    seeds = seeds / np.linalg.norm(seeds, axis=1, keepdims=True)
    cents = S.kmeans_refine(emb, seeds, n_iter=1)
    assigned = S.ivf_assign(emb, cents)

    path = str(tmp_path / "ivf_idx")
    S.ivf_save(assigned, cents, path)
    loaded, cents2 = S.ivf_load(spark, path)

    assert np.allclose(cents, cents2)
    assert loaded.count() == emb.count()
    want = sorted(
        (r["centroid_id"], r["vec_id"]) for r in assigned.collect()
    )
    got = sorted((r["centroid_id"], r["vec_id"]) for r in loaded.collect())
    assert got == want

    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    mem = [r["vec_id"] for r in S.ivf_topk(assigned, cents, qvec, k=5).collect()]
    dsk = [r["vec_id"] for r in S.ivf_topk(loaded, cents2, qvec, k=5).collect()]
    assert mem == dsk

    plan = (
        S.ivf_topk(loaded, cents2, qvec, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan


def test_kmeans_refine_scans_input_lineage_once(spark):
    """kmeans_refine must persist its (id, vector) projection: the
    upstream lineage is evaluated once, not once per Lloyd iteration.
    Accumulator-tracked pandas UDF in the lineage counts passes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("array<float>")
    def tracked(s):
        acc.add(1)
        return s

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(200)]
    base = spark.createDataFrame(rows, "vec_id long, raw array<float>")
    base = base.repartition(1)
    df = base.withColumn("embedding", tracked(F.col("raw"))).drop("raw")
    seeds = rng.normal(0, 1, (4, 8))
    seeds = seeds / np.linalg.norm(seeds, axis=1, keepdims=True)
    out = S.kmeans_refine(df, seeds, n_iter=4)
    assert out.shape == (4, 8)
    assert acc.value == 1, (
        f"upstream lineage evaluated {acc.value} times; expected one "
        "pass (vector projection must be persisted across iterations)"
    )


def test_batch_topk_matches_single_query_topk(spark, emb):
    """batch_cosine_topk(queries) == cosine_topk run per query (modulo
    the batch op's fixed-point ranking), and the query batch broadcasts."""
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    batch = S.batch_cosine_topk(emb, qs, k=5)
    got = {
        q: [r["vec_id"] for r in rows]
        for q, rows in __import__("itertools").groupby(
            batch.orderBy("q_id", F.desc("sim_fx"), "vec_id").collect(),
            key=lambda r: r["q_id"],
        )
    }
    for q in range(3):
        qvec = emb.where(F.col("vec_id") == q).collect()[0]["embedding"]
        exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=5).collect()]
        assert got[q] == exact, (q, got[q], exact)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_dedup_keep_best_survivor_policy(spark):
    """Highest score survives per duplicate group; score ties fall back
    to lowest id; unique docs always survive."""
    df = spark.createDataFrame(
        [
            (1, "same text", 10.0),
            (2, "same text", 30.0),   # winner: best score
            (3, "same text", 20.0),
            (4, "other", 5.0),
            (5, "tied", 7.0),         # winner: tie -> lowest id
            (6, "tied", 7.0),
        ],
        "doc_id long, text string, score double",
    )
    kept = sorted(
        r.doc_id
        for r in D.exact_dedup_keep_best(df, ["text"], "doc_id", "score").collect()
    )
    assert kept == [2, 4, 5]


def test_embedding_near_dup_default_is_not_cartesian(spark, emb):
    """Round-2 de-fang: with no block_col the operator must build LSH
    buckets internally and equi-join on them — a cartesian product may
    appear ONLY behind an explicit allow_brute=True."""
    sub = emb.where(F.col("vec_id") <= 100)
    default_plan = (
        D.embedding_near_dup_pairs(sub, threshold=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in default_plan, default_plan[:2000]
    assert "BroadcastNestedLoopJoin" not in default_plan, default_plan[:2000]
    brute_plan = (
        D.embedding_near_dup_pairs(sub, threshold=0.9, allow_brute=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert (
        "CartesianProduct" in brute_plan
        or "BroadcastNestedLoopJoin" in brute_plan
    )


def test_ivf_assign_matmul_matches_literal_path(spark, emb):
    """The Arrow-batch matmul assign agrees with the JVM literal argmax
    up to FP near-ties: numpy's blocked/SIMD summation can round a dot
    product one ulp differently from the JVM's sequential fold, so on an
    (effectively) tied pair of centroids the argmax may legitimately
    differ.  Any disagreement must therefore BE a near-tie — a mismatch
    with a clear score gap is a real bug."""
    cents = S.train_centroids_sample(emb, n_centroids=8)
    lit = {
        r["vec_id"]: r["centroid_id"]
        for r in S.ivf_assign(emb, cents, use_matmul=False).collect()
    }
    mm = {
        r["vec_id"]: r["centroid_id"]
        for r in S.ivf_assign(emb, cents, use_matmul=True).collect()
    }
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    assert set(lit) == set(mm)
    for vid, c_lit in lit.items():
        c_mm = mm[vid]
        if c_lit == c_mm:
            continue
        s_lit = float(vecs[vid] @ cents[c_lit])
        s_mm = float(vecs[vid] @ cents[c_mm])
        tol = 1e-9 * max(1.0, abs(s_lit), abs(s_mm))
        assert abs(s_lit - s_mm) <= tol, (
            f"{vid}: literal->{c_lit} ({s_lit}) vs matmul->{c_mm} "
            f"({s_mm}) differ beyond FP-tie tolerance"
        )


def test_embedding_near_dup_empty_input_returns_empty_pairs(spark):
    """No vectors -> no pairs; must not TypeError on the dim peek or
    launch the LSH plan at all."""
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = D.embedding_near_dup_pairs(empty)
    assert out.columns == ["id_a", "id_b", "cos_sim"]
    assert out.count() == 0


def test_ivf_assign_reuses_codebook_broadcast(spark, emb):
    """Repeated assigns against the same codebook must reuse one
    broadcast (per-call broadcasts leak executor memory across Lloyd
    iterations)."""
    dim = len(emb.select("embedding").first()[0])
    cents = np.random.default_rng(3).standard_normal((128, dim))
    S._CODEBOOK_BROADCASTS.clear()
    S.ivf_assign(emb, cents).count()
    S.ivf_assign(emb, cents).count()
    assert len(S._CODEBOOK_BROADCASTS) == 1
    other = np.random.default_rng(4).standard_normal((128, dim))
    S.ivf_assign(emb, other).count()
    assert len(S._CODEBOOK_BROADCASTS) == 2


def test_ivf_assign_plan_is_o1_in_k(spark, emb):
    """At production K the plan must NOT inline the codebook: plan size
    stays flat from K=256 to K=1024 (literal plans grow linearly —
    tens of MB of expression nodes at real codebook sizes)."""
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(7)
    plans = {}
    for k in (256, 1024):
        cents = rng.standard_normal((k, dim))
        df = S.ivf_assign(emb, cents)  # default: matmul above threshold
        plans[k] = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plans[k] or "Python" in plans[k]
    assert abs(len(plans[1024]) - len(plans[256])) < 1000, (
        len(plans[256]), len(plans[1024])
    )


def test_train_centroids_sample_no_count_prepass(spark, emb):
    """Default seeding is one TakeOrderedAndProject scan — no count()
    job; deterministic across calls."""
    a = S.train_centroids_sample(emb, n_centroids=8)
    b = S.train_centroids_sample(emb, n_centroids=8)
    assert a.shape == (8, len(emb.select("embedding").first()[0]))
    assert (a == b).all()


def test_line_dedup_strips_cross_doc_boilerplate(spark):
    rows = [
        (1, "BOILER\nunique one\n\nrepeat me\nrepeat me\nBOILER"),
        (2, "BOILER\nunique two\nother text"),
        (3, "BOILER\nunique three"),
        (4, "no shared lines\nat all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in D.line_dedup(df, "doc_id", "text", min_docs=3).collect()}
    # BOILER appears in 3 docs -> dropped everywhere (both copies in doc 1)
    assert out[1]["text"] == "unique one\n\nrepeat me\nrepeat me"
    assert out[1]["n_dropped"] == 2  # two BOILER positions removed
    # blank line preserved; within-doc repetition ("repeat me" x2, one doc) kept
    assert out[2]["text"] == "unique two\nother text"
    assert out[3]["text"] == "unique three"
    # doc with no dropped lines passes through byte-identical
    assert out[4]["text"] == "no shared lines\nat all"
    assert out[4]["n_dropped"] == 0
    # n_lines counts content lines before dropping (doc 1: 5 non-blank)
    assert out[1]["n_lines"] == 5


def test_line_dedup_min_docs_boundary(spark):
    rows = [(1, "shared\na"), (2, "shared\nb"), (3, "solo\nc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # min_docs=3: "shared" only appears in 2 docs -> nothing dropped
    kept = D.line_dedup(df, "doc_id", "text", min_docs=3)
    assert kept.where(F.col("n_dropped") > 0).count() == 0
    # min_docs=2: dropped from both
    dropped = {r["doc_id"]: r["text"] for r in D.line_dedup(df, "doc_id", "text", min_docs=2).collect()}
    assert dropped[1] == "a" and dropped[2] == "b" and dropped[3] == "solo\nc"


def test_pq_encode_shape_and_determinism(spark, emb):
    books = S.pq_train(emb, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    enc = S.pq_encode(emb, books).orderBy("vec_id")
    rows = enc.collect()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    # arrow and literal paths agree up to FP near-ties: the matmul
    # expansion (-2x.c+||c||^2) rounds differently from the literal
    # squared-difference fold, so argmin can flip on an effectively
    # equal pair of codes (same caveat as ivf_assign's matmul path)
    arrow = S.pq_encode(emb, books, use_arrow=True).orderBy("vec_id").collect()
    lit_codes = [c for r in rows for c in r["codes"]]
    arw_codes = [c for r in arrow for c in r["codes"]]
    agree = sum(a == b for a, b in zip(lit_codes, arw_codes)) / len(lit_codes)
    assert agree >= 0.995, f"literal/arrow agreement {agree}"


def test_pq_topk_recall_and_rerank(spark, emb):
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    exact = {r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()}
    books = S.pq_train(emb, m=16, n_codes=16)
    enc = S.pq_encode(emb, books)
    got = {r["vec_id"] for r in S.pq_topk(enc, books, qvec, k=10).collect()}
    assert len(exact & got) / 10 >= 0.5, f"ADC recall {len(exact & got)/10}"
    # standard recipe: 5x oversample + exact re-rank restores recall
    cand = [r["vec_id"] for r in S.pq_topk(enc, books, qvec, k=50).collect()]
    rr = {
        r["vec_id"]
        for r in S.cosine_topk(
            emb.where(F.col("vec_id").isin(cand)), qvec, k=10
        ).collect()
    }
    assert len(exact & rr) / 10 >= 0.9, f"rerank recall {len(exact & rr)/10}"


def test_pq_literal_paths_are_jvm_only(spark, emb):
    books = S.pq_train(emb, m=8, n_codes=16)
    enc = S.pq_encode(emb, books)  # 128 codes <= threshold -> literal
    qvec = [0.1] * 64
    for df in (enc, S.pq_topk(enc, books, qvec, k=5)):
        p = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
            assert marker not in p
    p = S.pq_topk(enc, books, qvec, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p


def test_semantic_dedup_removes_planted_copies(spark, emb):
    sub = emb.where(F.col("vec_id") <= 200)
    near = sub.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * F.lit(1.05)).otherwise(x),
        ).alias("embedding"),
        "label",
    )
    both = sub.unionByName(near)
    kept = D.semantic_dedup(both, threshold=0.95, n_clusters=8, n_iter=2)
    n_orig, n_kept = sub.count(), kept.count()
    planted = both.count() - n_orig
    survivors_high = kept.where(F.col("vec_id") >= 10_000).count()
    # most planted copies (cos ~1 to their original) die; copies only
    # survive when k-means separates the pair across clusters
    assert survivors_high <= 0.3 * planted, f"{survivors_high}/{planted} copies survived"
    # originals always win the keep-lowest-id rule
    assert kept.where(F.col("vec_id") <= 200).count() == n_orig


def test_minhash_candidate_pairs_rejects_short_signature(spark):
    import pyspark.errors

    sigs = spark.createDataFrame(
        [(1, [11, 22, 33, 44]), (2, [11, 22, 33, 44])], ["doc_id", "_sig"]
    )
    # k=4 signature, bands*rows_per_band=8 demanded -> runtime error,
    # not silent all-docs-collide banding
    with pytest.raises(Exception) as exc:
        D.minhash_candidate_pairs(sigs, "doc_id", bands=2, rows_per_band=4).collect()
    assert "bands*rows_per_band" in str(exc.value)
    # exact-length signature still works
    ok = D.minhash_candidate_pairs(sigs, "doc_id", bands=1, rows_per_band=4)
    assert ok.count() == 1  # identical sigs -> the (1,2) pair


def test_pq_encode_arrow_null_vector_yields_null_codes(spark, emb):
    books = S.pq_train(emb, m=8, n_codes=16)
    withnull = emb.limit(5).select(
        "vec_id",
        F.when(F.col("vec_id") == 1, F.lit(None)).otherwise(F.col("embedding")).alias("embedding"),
    )
    rows = {r["vec_id"]: r["codes"] for r in S.pq_encode(withnull, books, use_arrow=True).collect()}
    assert rows[1] is None  # null in -> null codes, not a stage crash
    assert all(v is not None for k, v in rows.items() if k != 1)
    lit = {r["vec_id"]: r["codes"] for r in S.pq_encode(withnull, books, use_arrow=False).collect()}
    assert lit[1] is None  # both paths null-propagate


# --------------------------------------------- connected-components resolution


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_dedup_components_chain_star_cycle(spark):
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4)]            # chain
        + [(10, 11), (10, 12), (10, 13)]    # star
        + [(20, 21), (21, 22), (20, 22)]    # cycle
        + [(30, 31)],                       # isolated pair
    )
    comp = {r["id"]: r["comp"] for r in D.dedup_components(pairs).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_dedup_components_orientation_agnostic(spark):
    # pair miners emit id_a < id_b, but components must not depend on it
    comp = {
        r["id"]: r["comp"]
        for r in D.dedup_components(_pairs(spark, [(2, 1), (2, 3), (4, 3)])).collect()
    }
    assert set(comp.values()) == {1} and len(comp) == 4


def test_dedup_components_rejects_nonpositive_max_iter(spark):
    # ADVICE r4: max_iter<=0 used to fall through the loop and NameError
    import pytest

    with pytest.raises(ValueError, match="max_iter"):
        D.dedup_components(_pairs(spark, [(1, 2)]), max_iter=0)


def test_dedup_components_long_chain_pointer_jump(spark):
    # 65-node chain: plain min-propagation needs 64 rounds; pointer
    # jumping must converge within the 10-round budget (O(log diameter))
    pairs = _pairs(spark, [(i, i + 1) for i in range(64)])
    comp = D.dedup_components(pairs, max_iter=10)
    assert {r["comp"] for r in comp.collect()} == {0}
    assert comp.count() == 65


def test_keep_components_vs_keep_first_v_graph(spark):
    # V graph (1,3),(2,3): keep_first keeps BOTH local minima 1 and 2
    # although they sit in one transitive cluster; components keeps one
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 3), (2, 3)])
    kf = sorted(r["doc_id"] for r in D.dedup_keep_first(pairs, df, "doc_id").collect())
    kc = sorted(
        r["doc_id"] for r in D.dedup_keep_components(pairs, df, "doc_id").collect()
    )
    assert kf == [1, 2]  # the under-merge this operator family fixes
    assert kc == [1]


def test_keep_components_best_quality_survivor(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.1), (2, "b", 0.9), (3, "c", 0.5), (9, "z", 0.0)],
        "doc_id long, text string, q double",
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    kept = D.dedup_keep_components(pairs, df, "doc_id", order_col="q")
    # best-q member of the {1,2,3} component, plus the unpaired doc 9
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 9]
    assert set(kept.columns) == {"doc_id", "text", "q"}


def test_near_dup_curation_capstone_keeps_best(spark, sf_dir):
    """q72 end-to-end: every planted mutant cluster resolves to its
    ORIGINAL doc (keep-best on n_chars) — keep-first would also kill
    originals' transitive partners; components + best-quality must
    keep exactly the originals and drop every mutant."""
    from gcf_corima_parquet_converter_spark import queries as Q

    rows = {
        r["is_mutant"]: r
        for r in Q.QUERIES["q72_near_dup_curation"](spark, sf_dir).collect()
    }
    # all survivors are originals: mutants lose keep-best inside their
    # cluster (8 chars shorter); a few mutants may slip through only if
    # LSH recall missed their pair — tolerate <= 2% of planted dups
    n_mut = rows.get(True, {"n_docs": 0})["n_docs"] if True in rows else 0
    assert n_mut <= 2, f"{n_mut} mutants survived keep-best resolution"
    # the corpus also carries ORGANIC near-dup clusters (q26 finds ~81
    # pairs at sf0.01 vs 50 planted); their non-best members drop too,
    # so the bound is loose-but-meaningful: most originals survive
    assert rows[False]["n_docs"] >= 450


def test_semantic_dedup_components_resolution(spark, emb):
    """resolution='components' removes planted copies at least as well
    as keep_first (components only merges clusters further), and never
    keeps both endpoints of a transitive chain."""
    sub = emb.where(F.col("vec_id") <= 120)
    near = sub.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * F.lit(1.05)).otherwise(x),
        ).alias("embedding"),
        "label",
    )
    both = sub.unionByName(near)
    kf = D.semantic_dedup(both, threshold=0.95, n_clusters=8, n_iter=2)
    cc = D.semantic_dedup(
        both, threshold=0.95, n_clusters=8, n_iter=2, resolution="components"
    )
    kf_ids = {r["vec_id"] for r in kf.select("vec_id").collect()}
    cc_ids = {r["vec_id"] for r in cc.select("vec_id").collect()}
    assert cc_ids <= kf_ids  # components keeps a subset (global minima)
    assert sub.count() <= len(cc_ids)  # originals survive (lowest ids)
    with pytest.raises(ValueError):
        D.semantic_dedup(both, resolution="bogus")


# ----------------------------------------------- duplicate-span dedup


def test_duplicate_spans_and_strip_match_python_model(spark):
    """duplicate_spans + strip vs a plain-Python sliding-window model
    (exact semantics: window hashes, >=min_docs distinct docs, maximal
    merged spans, covered tokens removed)."""
    rows = [
        (1, "a b c d e f g h i j k l m n o p"),
        (2, "x y z a b c d e f g h i j q r s"),
        (3, "one two three a b c d e f g h i j four"),
        (4, "short doc"),
        (5, None),
        (6, "a b c d e f g h repeated nowhere else at all truly"),
    ]
    W, MIN = 8, 2
    docs = {i: t.split() for i, t in rows if t}
    wins = {
        i: {p: " ".join(t[p : p + W]) for p in range(len(t) - W + 1)}
        for i, t in docs.items()
    }
    from collections import defaultdict

    owners = defaultdict(set)
    for i, ws in wins.items():
        for p, w in ws.items():
            owners[w].add(i)
    exp_spans = {}
    exp_text = {}
    for i, t in docs.items():
        dup_pos = sorted(p for p, w in wins[i].items() if len(owners[w]) >= MIN)
        spans = []
        for p in dup_pos:
            if spans and p == spans[-1][1] - W + 1:
                spans[-1] = (spans[-1][0], p + W)
            elif spans and p <= spans[-1][1] - W:
                pass
            else:
                spans.append((p, p + W))
        if spans:
            exp_spans[i] = spans
        covered = {k for s, e in spans for k in range(s, e)}
        exp_text[i] = " ".join(tok for k, tok in enumerate(t) if k not in covered)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spans = defaultdict(list)
    for r in D.duplicate_spans(df, "doc_id", "text", width=W).orderBy(
        "doc_id", "span_start"
    ).collect():
        got_spans[r["doc_id"]].append((r["span_start"], r["span_end"]))
    assert dict(got_spans) == exp_spans

    got_text = {
        r["doc_id"]: r["text"]
        for r in D.strip_duplicate_spans(df, "doc_id", "text", width=W).collect()
    }
    for i in docs:
        assert got_text[i] == exp_text[i], f"doc {i}"
    assert got_text[5] is None          # null text passes through
    assert got_text[4] == "short doc"   # shorter than width: untouched


def test_dedup_components_string_ids(spark):
    """Non-numeric ids (pair miners accept them) must label correctly —
    a long cast would null every edge and silently destroy the dedup."""
    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "id_a string, id_b string",
    )
    comp = {r["id"]: r["comp"] for r in D.dedup_components(pairs).collect()}
    assert comp == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }
    df = spark.createDataFrame(
        [(i, f"t{i}", float(n)) for i, n in
         [("doc-a", 1), ("doc-b", 9), ("doc-c", 5), ("doc-z", 0)]],
        "doc_id string, text string, q double",
    )
    kept = D.dedup_keep_components(pairs, df, "doc_id", order_col="q")
    assert sorted(r["doc_id"] for r in kept.collect()) == ["doc-b", "doc-z"]


def test_pq_topk_rerank_recovers_recall(spark, emb):
    """ADC shortlist + exact re-rank must recall at least as much of
    the true top-k as raw ADC, and with a full-corpus shortlist must
    equal exact brute force bit-for-bit."""
    books = S.pq_train(emb, m=8, n_codes=16)
    enc = S.pq_encode(emb, books)
    qvec = emb.where(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    truth = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    adc = {r["vec_id"] for r in S.pq_topk(enc, books, qvec, k=10).collect()}
    rr = {
        r["vec_id"]
        for r in S.pq_topk_rerank(enc, emb, books, qvec, k=10).collect()
    }
    assert len(rr & set(truth)) >= len(adc & set(truth))
    # shortlist = whole corpus -> identical to exact brute force
    full = [
        r["vec_id"]
        for r in S.pq_topk_rerank(
            enc, emb, books, qvec, k=10, shortlist=emb.count()
        ).collect()
    ]
    assert full == truth


# ------------------------------------------------- SQ8 scalar quantization


def test_sq_encode_reconstruction_bound(spark, emb):
    lo, hi = S.sq_train(emb)
    enc = S.sq_encode(emb, lo, hi)
    rows = {r["vec_id"]: r["codes"] for r in enc.collect()}
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    import numpy as np

    s = (hi - lo) / 255.0
    for vid, codes in list(rows.items())[:50]:
        x = np.asarray(orig[vid], dtype=np.float64)
        c = np.asarray(codes, dtype=np.float64)
        assert c.min() >= 0 and c.max() <= 255
        # half-step quantization error bound per dimension (+1 ulp slack)
        assert np.all(np.abs((lo + c * s) - x) <= s / 2 + 1e-9)


def test_sq_constant_dim_and_null_vector(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0]), (2, None)],
        "vec_id long, embedding array<float>",
    )
    lo, hi = S.sq_train(df)
    assert lo[0] == hi[0] == 1.0
    rows = {r["vec_id"]: r["codes"] for r in S.sq_encode(df, lo, hi).collect()}
    assert rows[0][0] == 0 and rows[1][0] == 0  # constant dim -> code 0
    assert rows[2] is None  # null vector -> null codes


def test_sq_topk_recall_and_rerank(spark, emb):
    qvec = emb.where(F.col("vec_id") == 1).collect()[0]["embedding"]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    lo, hi = S.sq_train(emb)
    enc = S.sq_encode(emb, lo, hi)
    got = [r["vec_id"] for r in S.sq_topk(enc, lo, hi, qvec, k=10).collect()]
    # 8-bit per-dimension distortion is tiny: ADC alone should nearly
    # reproduce the exact ranking
    assert len(set(exact) & set(got)) / 10 >= 0.8
    rr = [
        r["vec_id"]
        for r in S.sq_topk_rerank(enc, emb, lo, hi, qvec, k=10).collect()
    ]
    assert len(set(exact) & set(rr)) / 10 >= 0.9
    # full-corpus shortlist == brute force exactly (same tiebreak)
    n = emb.count()
    full = [
        r["vec_id"]
        for r in S.sq_topk_rerank(
            enc, emb, lo, hi, qvec, k=10, shortlist=n
        ).collect()
    ]
    assert full == exact


def test_sq_paths_are_jvm_only(spark, emb):
    lo, hi = S.sq_train(emb)
    enc = S.sq_encode(emb, lo, hi)
    qvec = [0.1] * 64
    for df in (enc, S.sq_topk(enc, lo, hi, qvec, k=5)):
        p = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
            assert marker not in p
    p = (
        S.sq_topk(enc, lo, hi, qvec, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p


# ------------------------------------------------- incremental exact dedup


def test_exact_dedup_incremental_batches(spark):
    batch1 = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa")], "doc_id long, text string"
    )
    day1 = D.exact_dedup_incremental(batch1, ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in day1.collect()) == [1, 2]
    index = day1.select("digest")

    # day 2: one dup of history, one internal dup pair, one genuinely new
    batch2 = spark.createDataFrame(
        [(10, "aaa"), (11, "ccc"), (12, "ccc"), (13, "ddd")],
        "doc_id long, text string",
    )
    day2 = D.exact_dedup_incremental(batch2, ["text"], "doc_id", seen=index)
    assert sorted(r["doc_id"] for r in day2.collect()) == [11, 13]

    # appending day2's digests makes the index current for day 3
    index = index.unionByName(day2.select("digest"))
    batch3 = spark.createDataFrame([(20, "ddd")], "doc_id long, text string")
    assert (
        D.exact_dedup_incremental(batch3, ["text"], "doc_id", seen=index).count()
        == 0
    )

    # incremental result == from-scratch dedup of the union (same survivor
    # ids modulo history precedence: every kept digest appears exactly once)
    all_kept = day1.unionByName(day2)
    assert all_kept.select("digest").distinct().count() == all_kept.count() == 4


# --------------------------------------------- incremental MinHash-LSH


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _distinct_text(seed, n=40):
    import random

    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


def test_minhash_incremental_flags_history_dups(spark):
    day1 = _mk_docs(spark, [(i, _distinct_text(i)) for i in range(1, 6)])
    index = D.minhash_index(day1, "doc_id", "text")
    assert index.columns == ["band", "bh", "doc_id"]
    assert index.count() == 5 * 8  # bands rows per doc

    near = _distinct_text(2).split()
    near[3], near[17] = "changed", "words"  # ~95% shingle overlap with doc 2
    day2 = _mk_docs(
        spark, [(10, " ".join(near)), (11, _distinct_text(999))]
    )
    flagged, new_idx = D.minhash_dedup_incremental(
        day2, index, "doc_id", "text"
    )
    pairs = {(r["new_id"], r["old_id"]) for r in flagged.collect()}
    assert (10, 2) in pairs
    assert not any(n == 11 for n, _ in pairs)

    # exact-verify path: history supplies texts only for suspects
    verified, _ = D.minhash_dedup_incremental(
        day2, index, "doc_id", "text", history=day1
    )
    vrows = {(r["new_id"], r["old_id"]) for r in verified.collect()}
    assert (10, 2) in vrows
    jac = {
        (r["new_id"], r["old_id"]): r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
        for r in verified.collect()
    }
    assert jac[(10, 2)] >= 0.5

    # appending day2's index rows makes day 3 see day-2 docs
    index2 = index.unionByName(new_idx)
    near11 = _distinct_text(999).split()
    near11[5] = "tweak"
    day3 = _mk_docs(spark, [(20, " ".join(near11))])
    flagged3, _ = D.minhash_dedup_incremental(day3, index2, "doc_id", "text")
    assert {(r["new_id"], r["old_id"]) for r in flagged3.collect()} >= {(20, 11)}


def test_minhash_incremental_id_collision_across_batches(spark):
    """An id reused across history and a new batch must not conflate the
    two documents in the exact-Jaccard verify: id_a binds only new-batch
    sets, id_b only history sets."""
    hist = _mk_docs(
        spark, [(2, _distinct_text(2)), (5, _distinct_text(5))]
    )
    index = D.minhash_index(hist, "doc_id", "text")

    near5 = _distinct_text(5).split()
    near5[1] = "tweak"
    near2 = _distinct_text(2).split()
    near2[4] = "other"
    # new doc reUSES id 2 but its text is a near-dup of HISTORY doc 5;
    # new doc 77 is a near-dup of history doc 2, making history's id 2 a
    # suspect — the exact collision the unioned-sets join conflated
    day2 = _mk_docs(spark, [(2, " ".join(near5)), (77, " ".join(near2))])
    verified, _ = D.minhash_dedup_incremental(
        day2, index, "doc_id", "text", history=hist, threshold=0.5
    )
    rows = verified.collect()
    pairs = {(r["new_id"], r["old_id"]) for r in rows}
    assert pairs == {(2, 5), (77, 2)}
    assert len(rows) == len(pairs)  # no duplicated/conflated rows
    by_pair = {(r["new_id"], r["old_id"]): r for r in rows}
    # (2, 5): n_b must be HISTORY doc 5's shingle count, not new doc 2's
    n_hist5 = len(set(zip(*[_distinct_text(5).split()[i:] for i in range(3)])))
    assert by_pair[(2, 5)]["n_b"] == n_hist5


def test_minhash_incremental_matches_full_batch_across_split(spark):
    """Every full-batch candidate pair that crosses the day boundary
    must be found by the incremental path (same k/bands/n)."""
    docs = [(i, _distinct_text(i)) for i in range(1, 9)]
    near = _distinct_text(4).split()
    near[0] = "x"
    docs.append((30, " ".join(near)))  # cross-boundary near-dup of doc 4
    day1 = _mk_docs(spark, docs[:6])
    day2 = _mk_docs(spark, docs[6:])
    full = D.minhash_dedup_pairs(
        _mk_docs(spark, docs), "doc_id", "text", threshold=0.5
    )
    crossing = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in full.collect()
        if (r["id_a"] <= 6) != (r["id_b"] <= 6)
    }
    verified, _ = D.minhash_dedup_incremental(
        day2,
        D.minhash_index(day1, "doc_id", "text"),
        "doc_id",
        "text",
        history=day1,
        threshold=0.5,
    )
    inc = {(r["new_id"], r["old_id"]) for r in verified.collect()}
    assert crossing <= inc


# --------------------------------------------------------- batched IVF


def test_ivf_topk_batch_matches_brute_at_full_probe(spark, emb):
    cents = S.train_centroids_sample(emb, n_centroids=8)
    assigned = S.ivf_assign(emb, cents)
    queries = emb.where(F.col("vec_id").isin([1, 5, 9])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = {
        (r["q_id"], r["vec_id"])
        for r in S.batch_cosine_topk(emb, queries, k=5).collect()
    }
    # probing every centroid == brute force, same fixed-point tiebreak
    full = {
        (r["q_id"], r["vec_id"])
        for r in S.ivf_topk_batch(
            assigned, cents, queries, k=5, n_probe=8
        ).collect()
    }
    assert full == brute
    # a partial probe keeps most of the recall at a fraction of the scan
    part = {
        (r["q_id"], r["vec_id"])
        for r in S.ivf_topk_batch(
            assigned, cents, queries, k=5, n_probe=3
        ).collect()
    }
    assert len(part & brute) / len(brute) >= 0.6


def test_ivf_topk_batch_prunes_scan_and_stays_jvm(spark, emb):
    cents = S.train_centroids_sample(emb, n_centroids=8)
    assigned = S.ivf_assign(emb, cents)
    queries = emb.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.ivf_topk_batch(assigned, cents, queries, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan and "isin" in plan.lower() or "IN (" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert marker not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ivf_topk_batch_preserves_string_query_ids(spark, emb):
    cents = S.train_centroids_sample(emb, n_centroids=8)
    assigned = S.ivf_assign(emb, cents)
    queries = (
        emb.where(F.col("vec_id").isin([1, 5]))
        .select(
            F.concat(F.lit("query-"), F.col("vec_id")).alias("q_id"),
            F.col("embedding").alias("q_vec"),
        )
    )
    out = S.ivf_topk_batch(assigned, cents, queries, k=3, n_probe=8)
    rows = out.collect()
    assert {r["q_id"] for r in rows} == {"query-1", "query-5"}
    assert out.schema["q_id"].dataType.simpleString() == "string"


# ------------------------------------------------- embedding hygiene


def test_normalize_embeddings_units_and_zeros(spark):
    import numpy as np

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: list(r["embedding"])
           for r in S.normalize_embeddings(df).collect()}
    assert got[1] == pytest.approx([0.6, 0.8], abs=1e-6)
    assert got[2] == [0.0, 0.0]  # zero vector passes through
    assert got[3] == pytest.approx([1.0, 0.0])
    # plan stays JVM-side
    plan = S.normalize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_mean_pool_matches_numpy(spark, sf_dir):
    import numpy as np

    from gcf_corima_parquet_converter_spark import catalog

    emb = catalog.load(spark, sf_dir, "embeddings").limit(60).select(
        (F.col("vec_id") % 7).alias("doc"), "embedding"
    )
    rows = emb.collect()
    got = {r["doc"]: (np.array(r["embedding"]), r["n_pooled"])
           for r in S.mean_pool(emb, ["doc"]).collect()}
    import collections

    acc = collections.defaultdict(list)
    for r in rows:
        acc[r["doc"]].append(np.array(r["embedding"], dtype=np.float64))
    for doc, vecs in acc.items():
        want = np.stack(vecs).mean(axis=0).astype(np.float32)
        vec, n = got[doc]
        assert n == len(vecs)
        np.testing.assert_allclose(vec, want, rtol=1e-6)
    # partial-aggregable JVM plan, no explode
    plan = S.mean_pool(emb, ["doc"], dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode of the vectors
    assert plan.lower().count("hashaggregate") >= 2


def test_ivfpq_topk_recall_and_pruned_code_scan(spark):
    """IVF-PQ (probe-pruned lists + ADC over codes): on clustered data
    the rerank recipe recovers the exact top-k (recall asserted), the
    pruned ADC scan stays JVM-only, and the base table round-trips
    through the ivf_save partition layout with file pruning."""
    import numpy as np

    rng = np.random.default_rng(21)
    n, dim, n_clusters = 3000, 32, 8
    planted = rng.normal(size=(n_clusters, dim))
    planted /= np.linalg.norm(planted, axis=1, keepdims=True)
    # sigma large enough that WITHIN-cluster geometry varies: with very
    # tight clusters PQ collapses all cluster-mates to identical codes
    # and ADC ranks ties arbitrarily (verified against a numpy model)
    pts = planted[rng.integers(0, n_clusters, n)] + rng.normal(
        0, 0.25, (n, dim)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)

    cents = S.kmeans_refine(
        emb, S.train_centroids_sample(emb, n_centroids=n_clusters), n_iter=1
    )
    books = S.pq_train(emb, m=8, n_codes=16, sample_size=512)
    base = S.ivfpq_encode(emb, cents, books)

    qvec = pts[7]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]

    adc = [
        r["vec_id"]
        for r in S.ivfpq_topk(base, cents, books, qvec, k=10, n_probe=4).collect()
    ]
    assert len(set(adc) & set(exact)) / 10 >= 0.2  # lossy codes alone

    rer = [
        r["vec_id"]
        for r in S.ivfpq_topk_rerank(
            base, emb, cents, books, qvec, k=10, n_probe=4, shortlist=120
        ).collect()
    ]
    assert len(set(rer) & set(exact)) / 10 >= 0.8

    # ADC stage plan: JVM-only scoring, no Python stage
    plan = (
        S.ivfpq_topk(base, cents, books, qvec, k=10, n_probe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert marker not in plan

    # persisted artifact: ivfpq_save/ivfpq_load round-trips model +
    # codes exactly and probes prune the parquet scan by centroid_id
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        S.ivfpq_save(base, cents, books, td)
        loaded, cents2, books2 = S.ivfpq_load(spark, td)
        assert np.allclose(cents, cents2) and np.allclose(books, books2)
        got = [
            r["vec_id"]
            for r in S.ivfpq_topk(
                loaded, cents2, books2, qvec, k=10, n_probe=4
            ).collect()
        ]
        assert got == adc
        lp = (
            S.ivfpq_topk(loaded, cents2, books2, qvec, k=10, n_probe=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [" in lp and "centroid_id" in lp.split(
            "PartitionFilters: ["
        )[1].split("]")[0]


def _clustered(rng, n, dim, n_clusters, sigma=0.25):
    planted = rng.normal(size=(n_clusters, dim))
    planted /= np.linalg.norm(planted, axis=1, keepdims=True)
    pts = planted[rng.integers(0, n_clusters, n)] + rng.normal(0, sigma, (n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def test_ivfpq_residual_mode_matches_numpy_and_beats_raw_adc(spark):
    """Residual PQ (r8, FAISS-standard): codes over ``x - centroid``
    with the per-list ``q·centroid`` ADC offset.  Pins (a) the Spark
    ADC scores against an exact numpy model of the same quantizer,
    (b) the quantization-error claim that funds the mode — at fixed
    m/n_codes, reconstruction from Spark's residual codes has lower
    MSE than from raw-vector codes on clustered data (recall@k for
    one query is too noisy to pin; MSE is the deterministic form of
    the same advantage) — and (c) the artifact meta roundtrip, so a
    loader can never mis-score a residual table."""
    rng = np.random.default_rng(33)
    n, dim, n_clusters, k = 3000, 32, 8, 10
    pts = _clustered(rng, n, dim, n_clusters)
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    cents = S.kmeans_refine(
        emb, S.train_centroids_sample(emb, n_centroids=n_clusters), n_iter=5
    )
    qvec = pts[7]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=k).collect()]

    books_raw = S.pq_train(emb, m=8, n_codes=16, sample_size=512)
    books_res = S.ivfpq_train(
        emb, cents, m=8, n_codes=16, sample_size=512, residual=True
    )
    base_raw = S.ivfpq_encode(emb, cents, books_raw)
    base_res = S.ivfpq_encode(emb, cents, books_res, residual=True)

    res_ids = {
        r["vec_id"]
        for r in S.ivfpq_topk(
            base_res, cents, books_res, qvec, k=k, n_probe=2, residual=True
        ).collect()
    }
    assert len(res_ids & set(exact)) / k >= 0.2  # loose sanity floor

    # (b) the residual advantage, in its deterministic form: decode
    # Spark's codes for BOTH modes and compare reconstruction MSE
    assign = np.argmax(pts @ cents.T, axis=1)

    def _mse(base, books, add_centroid):
        m, _, sub = books.shape
        rows = base.select("vec_id", "codes").collect()
        err = 0.0
        for r in rows:
            rec = np.concatenate(
                [books[j][r["codes"][j]] for j in range(m)]
            )
            if add_centroid:
                rec = rec + cents[assign[r["vec_id"]]]
            err += float(((pts[r["vec_id"]] - rec) ** 2).sum())
        return err / len(rows)

    mse_raw = _mse(base_raw, books_raw, add_centroid=False)
    mse_res = _mse(base_res, books_res, add_centroid=True)
    assert mse_res < mse_raw, (mse_res, mse_raw)

    # (a) numpy model of the same quantizer: assign -> residual ->
    # encode -> ADC score = q.centroid + sum_j lut[j][code_j]
    res = pts - cents[assign]
    m, n_codes, sub = books_res.shape
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        Xj = res[:, j * sub : (j + 1) * sub]
        d2 = ((Xj[:, None, :] - books_res[None, j]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    lut = np.array(
        [books_res[j] @ qvec[j * sub : (j + 1) * sub] for j in range(m)]
    )
    qc = cents @ qvec
    score = qc[assign] + lut[np.arange(m)[None, :], codes].sum(axis=1)
    probe = np.argsort(-qc)[:2]
    in_probe = np.isin(assign, probe)
    order = sorted(
        np.flatnonzero(in_probe), key=lambda i: (-score[i], i)
    )[:k]
    got = [
        (r["vec_id"], r["adc_score"])
        for r in S.ivfpq_topk(
            base_res, cents, books_res, qvec, k=k, n_probe=2, residual=True
        ).collect()
    ]
    assert [i for i, _ in got] == order
    for i, s in got:
        assert abs(s - score[i]) < 1e-9

    # meta travels with the artifact
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        S.ivfpq_save(base_res, cents, books_res, td, residual=True)
        loaded, c2, b2, meta = S.ivfpq_load(spark, td, with_meta=True)
        assert meta == {"residual": True}
        got2 = [
            r["vec_id"]
            for r in S.ivfpq_topk(
                loaded, c2, b2, qvec, k=k, n_probe=2, residual=meta["residual"]
            ).collect()
        ]
        assert got2 == order


def test_ivfpq_rerank_prunes_raw_side(spark, tmp_path):
    """r7 weak-item fix: when the raw-vector table carries centroid_id
    (ivf_save artifact / ivf_assign output) the rerank's raw pull is
    probe-pruned instead of a full-table semi-join scan — results are
    identical (every shortlist id lives in a probed list) and the raw
    scan's PartitionFilters prune on centroid_id."""
    rng = np.random.default_rng(34)
    n, dim, n_clusters, k = 3000, 32, 8, 10
    pts = _clustered(rng, n, dim, n_clusters)
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    cents = S.kmeans_refine(
        emb, S.train_centroids_sample(emb, n_centroids=n_clusters), n_iter=1
    )
    books = S.pq_train(emb, m=8, n_codes=16, sample_size=512)
    base = S.ivfpq_encode(emb, cents, books)
    qvec = pts[7]

    unpruned = S.ivfpq_topk_rerank(
        base, emb, cents, books, qvec, k=k, n_probe=4, shortlist=120,
        prune_raw=False,
    ).collect()
    assigned = S.ivf_assign(emb, cents)
    pruned = S.ivfpq_topk_rerank(
        base, assigned, cents, books, qvec, k=k, n_probe=4, shortlist=120
    ).collect()
    assert [r["vec_id"] for r in pruned] == [r["vec_id"] for r in unpruned]

    # persisted serving shape: codes artifact + raw-vector IVF artifact;
    # BOTH scans in the final plan prune on centroid_id
    codes_path, raw_path = str(tmp_path / "pq"), str(tmp_path / "raw")
    S.ivfpq_save(base, cents, books, codes_path)
    S.ivf_save(assigned, cents, raw_path)
    pq_base, c2, b2 = S.ivfpq_load(spark, codes_path)
    raw, _ = S.ivf_load(spark, raw_path)
    df = S.ivfpq_topk_rerank(pq_base, raw, c2, b2, qvec, k=k, n_probe=4,
                             shortlist=120)
    assert [r["vec_id"] for r in df.collect()] == [
        r["vec_id"] for r in unpruned
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    filters = [
        sec.split("]")[0] for sec in plan.split("PartitionFilters: [")[1:]
    ]
    pruned_scans = [f for f in filters if "centroid_id" in f]
    assert len(pruned_scans) >= 2, plan


def test_ivf_compact_folds_epochs(spark, tmp_path):
    """ivf_compact: fold streamed epochs into base/v2 via the manifest
    commit — identical probes, shard_lists files per list, streamed
    epochs masked for new readers (their dirs are GC'd one compaction
    later, protecting readers pinned on the previous manifest)."""
    import glob

    from gcf_corima_parquet_converter_spark.operators import manifest as M

    rng = np.random.default_rng(35)
    n, dim = 600, 16
    pts = rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [(i, pts[i].tolist()) for i in range(n)]
    sch = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, sch)
    cents = S.kmeans_refine(
        full, S.train_centroids_sample(full, n_centroids=4), n_iter=1
    )
    idx = str(tmp_path / "idx")
    S.ivf_save(
        S.ivf_assign(spark.createDataFrame(rows[:200], sch), cents), cents, idx
    )
    # two streamed epochs, written exactly as maintain_ivf_index lands them
    apath = idx + "/assignments"
    for epoch, chunk in ((0, rows[200:400]), (1, rows[400:])):
        M.write_epoch(
            S.ivf_assign(spark.createDataFrame(chunk, sch), cents)
            .select("vec_id", "embedding", "centroid_id"),
            apath, epoch, partition_cols=("centroid_id",),
        )
    loaded, c2 = S.ivf_load(spark, idx)
    qvec = pts[3]
    before = [r["vec_id"] for r in S.ivf_topk(loaded, c2, qvec, k=5).collect()]

    out = S.ivf_compact(spark, idx, shard_lists=1)
    assert {k: v for k, v in out.items() if k != "manifest"} == {
        "version": 2, "epochs_folded": 2, "rows": n, "migrated": False,
    }

    loaded2, c3 = S.ivf_load(spark, idx)
    assert np.allclose(c2, c3)
    assert loaded2.count() == n
    assert [r[0] for r in loaded2.select("epoch").distinct().collect()] == [-1]
    after = [r["vec_id"] for r in S.ivf_topk(loaded2, c3, qvec, k=5).collect()]
    assert after == before
    dirs = glob.glob(M.base_dir(apath, 2) + "/epoch=-1/centroid_id=*")
    assert len(dirs) >= 2
    for d in dirs:
        assert len(glob.glob(d + "/*.parquet")) == 1, d
    # folded epoch dirs survive one cycle (pinned-reader protection)
    # but the manifest masks them for every new reader
    assert M.manifest_resolve(spark, apath)["folded_epochs"] == [0, 1]
    # second compaction GCs their directories (the stale ids leave the
    # folded list one cycle later, once the dirs are gone)
    out2 = S.ivf_compact(spark, idx, shard_lists=1)
    assert out2["version"] == 3 and out2["rows"] == n
    assert M.list_epochs(spark, apath) == []
    loaded3, _ = S.ivf_load(spark, idx)
    assert loaded3.count() == n
    out3 = S.ivf_compact(spark, idx, shard_lists=1)
    assert M.manifest_resolve(spark, apath)["folded_epochs"] == []
    assert out3["version"] == 4 and out3["rows"] == n


def test_ivfpq_topk_batch_matches_single_query_path(spark):
    """Batch ADC (r8): one pass over the pruned codes serves the whole
    query batch; per-query results must equal the single-query
    ivfpq_topk exactly (ids AND scores), in both raw and residual
    modes, and the batch rerank must equal per-query rerank ids."""
    rng = np.random.default_rng(36)
    n, dim, n_clusters, k, nq = 3000, 32, 8, 5, 4
    pts = _clustered(rng, n, dim, n_clusters)
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    cents = S.kmeans_refine(
        emb, S.train_centroids_sample(emb, n_centroids=n_clusters), n_iter=5
    )
    qdf = spark.createDataFrame(
        [(qi, pts[qi * 7].tolist()) for qi in range(nq)],
        "q_id long, q_vec array<double>",
    )

    for residual in (False, True):
        if residual:
            books = S.ivfpq_train(
                emb, cents, m=8, n_codes=16, sample_size=512, residual=True
            )
        else:
            books = S.pq_train(emb, m=8, n_codes=16, sample_size=512)
        base = S.ivfpq_encode(emb, cents, books, residual=residual)
        got = {
            (r["q_id"], r["vec_id"]): r["adc_score"]
            for r in S.ivfpq_topk_batch(
                base, cents, books, qdf, k=k, n_probe=2, residual=residual
            ).collect()
        }
        for qi in range(nq):
            single = S.ivfpq_topk(
                base, cents, books, pts[qi * 7], k=k, n_probe=2,
                residual=residual,
            ).collect()
            for r in single:
                assert abs(got[(qi, r["vec_id"])] - r["adc_score"]) < 1e-9, (
                    residual, qi, r,
                )
        assert len(got) == nq * k

    # batch rerank ids == per-query rerank ids (raw mode, pruned raw)
    books = S.pq_train(emb, m=8, n_codes=16, sample_size=512)
    base = S.ivfpq_encode(emb, cents, books)
    assigned = S.ivf_assign(emb, cents)
    br = S.ivfpq_topk_rerank_batch(
        base, assigned, cents, books, qdf, k=k, n_probe=4, shortlist=200
    )
    got_ids: dict[int, list[int]] = {}
    for r in br.orderBy("q_id", F.desc("sim_fx"), "vec_id").collect():
        got_ids.setdefault(r["q_id"], []).append(r["vec_id"])
    for qi in range(nq):
        want = [
            r["vec_id"]
            for r in S.ivfpq_topk_rerank(
                base, assigned, cents, books, pts[qi * 7], k=k, n_probe=4,
                shortlist=200,
            ).collect()
        ]
        assert got_ids[qi] == want, qi

    # plan posture: pruned code scan, no cartesian, JVM-only
    df = S.ivfpq_topk_batch(base, cents, books, qdf, k=k, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_lsh_tuning_report_matches_s_curve_and_measured_recall(spark):
    """The tuning report's S-curve is the real collision probability:
    for q26's k=16/bands=4 config, measured band-collision frequency
    over planted pairs at J~0.9 must sit near S(0.9), and the
    threshold moves the documented direction when r grows."""
    rep = D.lsh_tuning_report(k=16, bands=4)
    assert rep["rows_per_band"] == 4
    # closed form checks
    assert abs(rep["detection_prob"][0.9] - (1 - (1 - 0.9**4) ** 4)) < 1e-3  # report rounds to 4dp
    assert abs(rep["threshold_jaccard"] - 0.25 ** 0.25) < 1e-4
    # lever direction: fewer bands at same k -> higher threshold
    assert (
        D.lsh_tuning_report(k=16, bands=2)["threshold_jaccard"]
        > rep["threshold_jaccard"]
    )
    with pytest.raises(ValueError):
        D.lsh_tuning_report(k=16, bands=5)

    # empirical: planted near-dup pairs at J ~ 0.82-0.92 should collide
    # at a frequency compatible with the S-curve's prediction there
    rng = __import__("numpy").random.default_rng(40)
    words = [f"w{i}" for i in range(400)]
    rows = []
    n_pairs = 60
    for i in range(n_pairs):
        base = list(rng.choice(words, 40, replace=False))
        mut = base.copy()
        mut[rng.integers(0, 40)] = f"x{i}"  # one word swap -> high J
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = D._shingle_sets(df, "doc_id", "text", 3)
    sigs = sets.select(F.col("doc_id"), D._signature_array(16).alias("_sig"))
    cand = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, _validate=False
        ).collect()
    }
    hit = sum(1 for i in range(n_pairs) if (2 * i, 2 * i + 1) in cand)
    # one word swap in 40 changes <= 3 of ~38 shingles -> J >= ~0.84;
    # S(0.84) ~ 0.88, S(0.92) ~ 0.97 — allow a generous band
    assert 0.7 <= hit / n_pairs <= 1.0, hit / n_pairs


def test_ivfpq_topk_batch_string_qids_and_null_vectors(spark):
    """Serving contracts: string query ids ride through both batch ops
    (the schema is copied from the caller's frame), and null query
    vectors are skipped instead of crashing the driver-side LUT
    build."""
    rng = np.random.default_rng(41)
    n, dim = 500, 16
    pts = rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = S.kmeans_refine(
        emb, S.train_centroids_sample(emb, n_centroids=4), n_iter=2
    )
    books = S.pq_train(emb, m=4, n_codes=16, sample_size=256)
    base = S.ivfpq_encode(emb, cents, books)
    qdf = spark.createDataFrame(
        [("qa", pts[3].tolist()), ("qb", pts[9].tolist()), ("qnull", None)],
        "q_id string, q_vec array<double>",
    )
    got = S.ivfpq_topk_batch(base, cents, books, qdf, k=4, n_probe=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    assert set(by_q) == {"qa", "qb"}  # null query skipped
    for qid, qi in (("qa", 3), ("qb", 9)):
        want = [
            r["vec_id"]
            for r in S.ivfpq_topk(base, cents, books, pts[qi], k=4,
                                  n_probe=4).collect()
        ]
        assert by_q[qid] == want, qid

    rr = S.ivfpq_topk_rerank_batch(
        base, S.ivf_assign(emb, cents), cents, books, qdf, k=4, n_probe=4,
        shortlist=50,
    ).collect()
    assert {r["q_id"] for r in rr} == {"qa", "qb"}


def test_ivf_compact_shard_lists_and_sharded_layout(spark, tmp_path):
    """ivf_compact with shard_lists > 1: each list directory lands as
    at most shard_lists files (exactly 1 only at the default — hash
    collisions between (list, shard) combos may merge shards) and
    probes are unchanged."""
    import glob

    rng = np.random.default_rng(42)
    n, dim = 600, 16
    pts = rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [(i, pts[i].tolist()) for i in range(n)]
    sch = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, sch)
    cents = S.kmeans_refine(
        full, S.train_centroids_sample(full, n_centroids=4), n_iter=1
    )
    from gcf_corima_parquet_converter_spark.operators import manifest as M

    idx = str(tmp_path / "idx")
    S.ivf_save(S.ivf_assign(spark.createDataFrame(rows[:300], sch), cents),
               cents, idx)
    M.write_epoch(
        S.ivf_assign(spark.createDataFrame(rows[300:], sch), cents)
        .select("vec_id", "embedding", "centroid_id"),
        idx + "/assignments", 0, partition_cols=("centroid_id",),
    )
    loaded, c2 = S.ivf_load(spark, idx)
    before = [r["vec_id"] for r in S.ivf_topk(loaded, c2, pts[3], k=5).collect()]
    out = S.ivf_compact(spark, idx, shard_lists=3)
    assert out["rows"] == n
    loaded2, c3 = S.ivf_load(spark, idx)
    assert [
        r["vec_id"] for r in S.ivf_topk(loaded2, c3, pts[3], k=5).collect()
    ] == before
    dirs = glob.glob(
        M.base_dir(idx + "/assignments", 2) + "/epoch=-1/centroid_id=*"
    )
    assert len(dirs) >= 2
    counts = [len(glob.glob(d + "/*.parquet")) for d in dirs]
    # at most shard_lists; at test scale AQE coalesces the tiny shuffle
    # partitions so shards merge further — the bound is what matters
    assert all(1 <= c <= 3 for c in counts), counts


def test_lsh_params_for_threshold_derivation(spark):
    """target_threshold= replaces hand-picked banding: the derivation
    picks the factorization of k whose S-curve threshold is nearest
    the stated Jaccard, and minhash_candidate_pairs with the intent
    parameter equals the explicit call with the derived banding."""
    # pure math: best factorization among divisors of k
    for k, target in ((32, 0.5), (32, 0.9), (16, 0.3), (64, 0.7)):
        p = D.lsh_params_for_threshold(k, target)
        assert p["bands"] * p["rows_per_band"] == k
        best = min(
            (
                abs((1.0 / b) ** (b / k) - target)
                for b in range(1, k + 1) if k % b == 0
            ),
        )
        # threshold_jaccard is reported rounded to 4 decimals
        assert abs(p["threshold_jaccard"] - target) <= best + 1e-4
    # a higher target needs a HIGHER collision bar: fewer bands
    lo = D.lsh_params_for_threshold(32, 0.3)
    hi = D.lsh_params_for_threshold(32, 0.9)
    assert hi["bands"] < lo["bands"]
    assert hi["threshold_jaccard"] > lo["threshold_jaccard"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        D.lsh_params_for_threshold(32, 1.5)

    # plumbing parity: intent == explicit derived banding
    rows = [
        (i, f"shared body of document {i % 7} with words " + " ".join(
            f"w{((i % 7) * 13 + j) % 53}" for j in range(12)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = D.minhash_signatures(df, "doc_id", "text", k=16)
    p = D.lsh_params_for_threshold(16, 0.4)
    want = {
        tuple(r)
        for r in D.minhash_candidate_pairs(
            sigs, "doc_id", bands=p["bands"],
            rows_per_band=p["rows_per_band"],
        ).collect()
    }
    got = {
        tuple(r)
        for r in D.minhash_candidate_pairs(
            sigs, "doc_id", target_threshold=0.4
        ).collect()
    }
    assert got == want and got

    # the array _sig form carries no length: intent must be rejected
    asig = D._shingle_sets(df, "doc_id", "text", 3).select(
        F.col("doc_id"), D._signature_array(16).alias("_sig")
    )
    with _pytest.raises(ValueError, match="signature length"):
        D.minhash_candidate_pairs(asig, "doc_id", target_threshold=0.4)

    # end-to-end: minhash_dedup_pairs accepts the intent form
    out = D.minhash_dedup_pairs(
        df, "doc_id", "text", k=16, threshold=0.5, target_threshold=0.4
    )
    assert out.count() > 0


# --------------------------------------------- LSH hot-bucket capping


@pytest.fixture(scope="module")
def hot_cluster(spark):
    """A mass-boilerplate corpus: 400 IDENTICAL docs (every band of
    every doc lands in the same bucket) plus 40 distinct docs — the
    skew shape where the uncapped band self-join goes quadratic."""
    boiler = "terms of service apply to all users of this site please read carefully"
    rows = [(i, boiler) for i in range(400)]
    rows += [
        (1000 + i, f"unique document number {i} about topic {i * 7} with words {i * 13}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_hot_bucket_cap_bounds_pairs(spark, hot_cluster):
    sets = D._shingle_sets(hot_cluster, "doc_id", "text", 3)
    sigs = sets.select(F.col("doc_id"), D._signature_array(16).alias("_sig"))
    capped = D.minhash_candidate_pairs(
        sigs, "doc_id", bands=4, rows_per_band=4, max_bucket=50
    )
    n_capped = capped.count()
    # star linking: the 400-doc cluster emits 399 pairs, not 400*399/2
    assert n_capped < 1000, f"capped pair count {n_capped} is not linear"
    uncapped = D.minhash_candidate_pairs(
        sigs, "doc_id", bands=4, rows_per_band=4, max_bucket=None
    )
    assert uncapped.count() >= 400 * 399 // 2  # quadratic without the cap


def test_minhash_hot_bucket_cap_keeps_cluster_connected(spark, hot_cluster):
    # end-to-end through the exact-verify phase + keep-first: the 400
    # identical docs must still collapse to ONE survivor under the cap
    pairs = D.minhash_dedup_pairs(
        hot_cluster, "doc_id", "text", k=16, bands=4, threshold=0.5,
        max_bucket=50,
    )
    kept = D.dedup_keep_first(pairs, hot_cluster, "doc_id")
    cluster_survivors = kept.where(F.col("doc_id") < 1000).count()
    assert cluster_survivors == 1
    # and none of the 40 distinct docs were harmed
    assert kept.where(F.col("doc_id") >= 1000).count() == 40


def test_minhash_cap_is_noop_on_cold_buckets(spark, mutated):
    sets = D._shingle_sets(mutated, "doc_id", "text", 3)
    sigs = sets.select(F.col("doc_id"), D._signature_array(16).alias("_sig"))
    with_cap = {
        tuple(r)
        for r in D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, max_bucket=1024
        ).collect()
    }
    without = {
        tuple(r)
        for r in D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, max_bucket=None
        ).collect()
    }
    assert with_cap == without and with_cap


def test_simhash_hot_bucket_cap(spark, hot_cluster):
    sig = D.simhash(hot_cluster, "doc_id", "text")
    capped = D.simhash_candidate_pairs(sig, "doc_id", max_bucket=50)
    n = capped.count()
    assert n < 1000, f"capped simhash pair count {n} is not linear"
    # identical docs: hamming 0 to the representative — the whole
    # cluster is still flagged after the hamming<=3 trim
    dup_ids = {
        r["id_b"]
        for r in capped.where(F.col("hamming") <= 3).collect()
    } | {
        r["id_a"]
        for r in capped.where(F.col("hamming") <= 3).collect()
    }
    assert set(range(400)) <= dup_ids
    uncapped = D.simhash_candidate_pairs(sig, "doc_id", max_bucket=None)
    assert uncapped.count() >= 400 * 399 // 2


def test_minhash_cap_rejects_degenerate_value(spark, hot_cluster):
    sets = D._shingle_sets(hot_cluster, "doc_id", "text", 3)
    sigs = sets.select(F.col("doc_id"), D._signature_array(16).alias("_sig"))
    with pytest.raises(ValueError, match="max_bucket"):
        D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, max_bucket=1
        ).collect()


# ------------------------------------------- driver-batch contract


def test_ivf_topk_batch_rejects_oversized_batch(spark, emb):
    cents = S.train_centroids_sample(emb, n_centroids=8)
    assigned = S.ivf_assign(emb, cents)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    with pytest.raises(ValueError, match="max_query_batch"):
        S.ivf_topk_batch(
            assigned, cents, queries, k=3, n_probe=2, max_query_batch=4
        )
    # at exactly the cap the call proceeds
    out = S.ivf_topk_batch(
        assigned, cents, queries, k=3, n_probe=8, max_query_batch=5
    )
    assert out.select("q_id").distinct().count() == 5


def test_ivfpq_topk_batch_rejects_oversized_batch(spark, emb):
    cents = S.train_centroids_sample(emb, n_centroids=4)
    books = S.pq_train(emb, m=4, n_codes=8)
    assigned = S.ivf_assign(emb, cents)
    base = S.ivfpq_encode(assigned, cents, books)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    with pytest.raises(ValueError, match="max_query_batch"):
        S.ivfpq_topk_batch(
            base, cents, books, queries, k=2, max_query_batch=2
        )


def test_embedding_near_dup_hot_bucket_cap(spark):
    """Mass-duplicate embedding family: the opt-in star-cap bounds the
    LSH-bucket self-join linearly and the exact cosine verify still
    flags the whole cluster (cos(rep, member) == 1)."""
    import numpy as np

    rng = np.random.default_rng(3)
    v0 = rng.normal(size=16)
    v0 /= np.linalg.norm(v0)
    rows = [(i, [float(x) for x in v0]) for i in range(300)]  # identical
    for i in range(40):  # distinct unit vectors
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append((1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = D.embedding_near_dup_pairs(
        emb, threshold=0.99, dim=16, max_bucket=50
    )
    got = capped.collect()
    flagged = {r["id_b"] for r in got} | {r["id_a"] for r in got}
    assert set(range(300)) <= flagged  # whole cluster flagged via rep
    # linear, not quadratic: 300*299/2 = 44850 without the cap
    assert len(got) < 1500
    uncapped_n = D.embedding_near_dup_pairs(
        emb, threshold=0.99, dim=16
    ).count()
    assert uncapped_n >= 300 * 299 // 2


def test_ivf_compact_deletes_ids_merge_on_compact(spark, tmp_path):
    """Lakehouse-style deletion for the ANN index: removals take effect
    at compaction (the fold anti-joins them out of base + epochs);
    probes afterwards never return the deleted ids and everything else
    survives exactly once."""
    import numpy as np

    from gcf_corima_parquet_converter_spark.operators import manifest as M

    rng = np.random.default_rng(7)
    n, dim = 200, 8
    pts = rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in pts[i]]) for i in range(n)]
    sch = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, sch)
    cents = S.train_centroids_sample(full, n_centroids=4)
    idx = str(tmp_path / "ivf_del")
    S.ivf_save(
        S.ivf_assign(spark.createDataFrame(rows[:150], sch), cents), cents, idx
    )
    # a streamed epoch on top of the base
    M.write_epoch(
        S.ivf_assign(spark.createDataFrame(rows[150:], sch), cents),
        idx + "/assignments", 0, partition_cols=("centroid_id",),
    )
    dead = [3, 42, 160]  # from the base AND from the epoch
    out = S.ivf_compact(
        spark, idx,
        delete_ids=spark.createDataFrame([(i,) for i in dead], "vec_id long"),
    )
    assert out["rows"] == n - len(dead)
    loaded, cents2 = S.ivf_load(spark, idx)
    got = sorted(r["vec_id"] for r in loaded.select("vec_id").collect())
    assert got == sorted(set(range(n)) - set(dead))
    # probe at full coverage returns brute-force order over the survivors
    qvec = pts[3]  # query BY a deleted vector: it must not return itself
    top = [
        r["vec_id"]
        for r in S.ivf_topk(loaded, cents2, qvec, k=5, n_probe=4).collect()
    ]
    assert 3 not in top and len(top) == 5


def test_compact_dedup_indexes_deletes_purged_docs(spark, tmp_path):
    """Merge-on-compact deletion for the dedup indexes: purged docs'
    rows leave both indexes at the fold, so a re-ingested copy of a
    purged doc is NOVEL again (no ghost dedup)."""
    from gcf_corima_parquet_converter_spark.operators import manifest as M

    rows = [(i, f"document body number {i} stays") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dig_p = str(tmp_path / "digidx")
    band_p = str(tmp_path / "bandidx")
    fresh = D.exact_dedup_incremental(df, ["text"], "doc_id")
    M.write_epoch(fresh.select("digest"), dig_p, 0, append=True)
    M.write_epoch(
        D.minhash_index(df, "doc_id", "text", k=16, bands=4), band_p, 0,
        append=True,
    )
    purged = df.where(F.col("doc_id") == 7)
    purged_digest = D.exact_dedup_incremental(
        purged, ["text"], "doc_id"
    ).select("digest")
    out = D.compact_dedup_indexes(
        spark, digest_path=dig_p, band_path=band_p,
        delete_digests=purged_digest,
        delete_ids=purged.select("doc_id"),
    )
    assert out["digest"]["rows"] == 29
    assert out["band"]["rows"] == 29 * 4  # 4 bands per doc
    # the re-ingested copy of the purged doc is novel against the index
    seen = D.load_dedup_index(spark, dig_p)
    again = D.exact_dedup_incremental(purged, ["text"], "doc_id", seen=seen)
    assert again.count() == 1
    # and a non-purged doc is still deduped
    dup = df.where(F.col("doc_id") == 3)
    assert D.exact_dedup_incremental(dup, ["text"], "doc_id", seen=seen).count() == 0
    # band index: id 7 gone, everything else intact
    band = D.load_dedup_index(spark, band_p)
    assert band.where(F.col("doc_id") == 7).count() == 0
    assert band.select("doc_id").distinct().count() == 29


# ------------------------------------------- measure-first auto cap (r12)


def _flat_sigs(spark, n_hot, n_cold, k=16):
    """Signature frame with a planted identical-signature family of
    ``n_hot`` docs (every band collides) plus ``n_cold`` docs whose
    signatures are id-derived (no collisions) — built directly so the
    auto-probe tests don't pay the shingle pipeline."""
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.lit(7777 + j) for j in range(k)]).alias("_sig"),
    )
    cold = spark.range(n_cold).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.array(
            *[F.xxhash64(F.col("id") + F.lit(j * 104729)) for j in range(k)]
        ).alias("_sig"),
    )
    return hot.unionByName(cold)


def test_minhash_auto_cap_bounds_planted_family_without_caller_opt_in(spark):
    """r11 verdict #3's acceptance: a planted multi-thousand-identical
    corpus completes with LINEAR pair volume under the DEFAULT call —
    no max_bucket argument — and the decision is surfaced."""
    sigs = _flat_sigs(spark, n_hot=5000, n_cold=200)
    with pytest.warns(UserWarning, match="star-cap enabled"):
        pairs = D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, _validate=False
        )
        n = pairs.count()
    # star linking: 4999 pairs against the min-id rep, not 12.5M
    assert n < 6000, f"auto cap did not bound the planted family: {n}"
    # the family stays fully connected through the representative
    reps = pairs.where(F.col("id_a") == 0)
    assert reps.count() == 4999


def test_minhash_auto_probe_is_noop_on_uniform_corpus(spark):
    """Cold corpus: the probe resolves to the EXACT uncapped plan (no
    _bsz stats join anywhere) and emits no advisory."""
    import warnings as W

    sigs = _flat_sigs(spark, n_hot=0, n_cold=500)
    with W.catch_warnings():
        W.simplefilter("error")  # any advisory fails the test
        auto = D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, _validate=False
        )
    explicit = D.minhash_candidate_pairs(
        sigs, "doc_id", bands=4, rows_per_band=4, max_bucket=None,
        _validate=False,
    )
    auto_plan = auto._jdf.queryExecution().optimizedPlan().toString()
    none_plan = explicit._jdf.queryExecution().optimizedPlan().toString()
    assert "_bsz" not in auto_plan
    assert auto_plan.count("Join") == none_plan.count("Join")
    assert auto.count() == explicit.count()


def test_auto_cap_rejects_unknown_string(spark):
    sigs = _flat_sigs(spark, n_hot=0, n_cold=10)
    with pytest.raises(ValueError, match="'auto'"):
        D.minhash_candidate_pairs(
            sigs, "doc_id", bands=4, rows_per_band=4, max_bucket="always",
            _validate=False,
        )


def test_simhash_auto_cap_bounds_planted_family(spark):
    rows = [(i, 0x1234_5678_9ABC_DEF0) for i in range(2000)]
    rows += [(10_000 + i, (i * 0x9E3779B97F4A7C15) & 0x7FFF_FFFF_FFFF_FFFF) for i in range(100)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    with pytest.warns(UserWarning, match="star-cap enabled"):
        pairs = D.simhash_candidate_pairs(sig, "doc_id")
        n = pairs.count()
    assert n < 5000, f"auto cap did not bound the simhash family: {n}"
    # identical signatures: hamming 0 to the rep, whole family flagged
    flagged = pairs.where(F.col("hamming") == 0)
    got = {r["id_b"] for r in flagged.collect()} | {
        r["id_a"] for r in flagged.collect()
    }
    assert set(range(2000)) <= got


def test_embedding_auto_cap_bounds_planted_family(spark):
    hot = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        F.array(F.lit(1)).alias("lsh_bucket"),
    )
    cold = spark.range(100).select(
        (F.col("id") + 10_000).alias("vec_id"),
        F.array(F.lit(0.0), F.lit(1.0)).alias("embedding"),
        F.array((F.col("id") + 100).cast("int")).alias("lsh_bucket"),
    )
    emb = hot.unionByName(cold)
    with pytest.warns(UserWarning, match="star-cap enabled"):
        pairs = D.embedding_near_dup_pairs(
            emb, threshold=0.99, block_col="lsh_bucket"
        )
        n = pairs.count()
    assert n < 3000, f"auto cap did not bound the embedding family: {n}"
    flagged = pairs.select("id_a").union(pairs.select("id_b")).distinct()
    assert flagged.where(F.col("id_a") < 2000).count() == 2000


# ---------------------------------- pending-delete overlay (r12)


def test_exact_dedup_incremental_pending_deletes_overlay(spark, tmp_path):
    """r11 verdict #5: a purged doc re-ingests as NOVEL before any
    compaction runs — the overlay voids its digest out of the loaded
    index at query time, no caller-side glue."""
    from gcf_corima_parquet_converter_spark.operators import manifest as M

    rows = [(i, f"document body number {i} stays") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dig_p = str(tmp_path / "digidx")
    M.write_epoch(
        D.exact_dedup_incremental(df, ["text"], "doc_id").select("digest"),
        dig_p, 0, append=True,
    )
    purged = df.where(F.col("doc_id") == 7)
    purged_digest = D.exact_dedup_incremental(
        purged, ["text"], "doc_id"
    ).select("digest")
    seen = D.load_dedup_index(spark, dig_p)  # NO compaction has run
    # without the overlay the ghost suppresses the re-ingest
    assert D.exact_dedup_incremental(
        purged, ["text"], "doc_id", seen=seen
    ).count() == 0
    # with the overlay the purged doc is novel again...
    assert D.exact_dedup_incremental(
        purged, ["text"], "doc_id", seen=seen,
        pending_deletes=purged_digest,
    ).count() == 1
    # ...and non-purged docs are still deduplicated
    dup = df.where(F.col("doc_id") == 3)
    assert D.exact_dedup_incremental(
        dup, ["text"], "doc_id", seen=seen, pending_deletes=purged_digest
    ).count() == 0


def test_minhash_dedup_incremental_pending_deletes_overlay(spark):
    """Band-index twin: the purged doc's ghost bands stop flagging its
    re-ingest; other history docs keep flagging their near-dups."""
    rows = [
        (i, f"the quick brown fox paragraph number {i} about subject {i * 3}")
        for i in range(10)
    ]
    hist = spark.createDataFrame(rows, "doc_id long, text string")
    index = D.minhash_index(hist, "doc_id", "text", k=16, bands=4)
    # re-ingest doc 4's text verbatim under a new id
    reingest = hist.where(F.col("doc_id") == 4).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    flagged, _ = D.minhash_dedup_incremental(
        reingest, index, "doc_id", "text", k=16, bands=4, history=hist
    )
    assert flagged.count() > 0  # ghost blocks it without the overlay
    pend = spark.createDataFrame([(4,)], "doc_id long")
    flagged2, _ = D.minhash_dedup_incremental(
        reingest, index, "doc_id", "text", k=16, bands=4, history=hist,
        pending_deletes=pend,
    )
    assert flagged2.count() == 0  # purged ghost voided: novel again
    # a different doc's near-dup is still flagged under the overlay
    other = hist.where(F.col("doc_id") == 6).select(
        (F.col("doc_id") + 200).alias("doc_id"), "text"
    )
    flagged3, _ = D.minhash_dedup_incremental(
        other, index, "doc_id", "text", k=16, bands=4, history=hist,
        pending_deletes=pend,
    )
    assert flagged3.where(F.col("old_id") == 6).count() == 1


def test_minhash_incremental_auto_cap_bounds_hot_index_bucket(spark):
    """r12: the incremental band join's cross-product hazard — a
    template family in history AND in the batch — is star-capped by
    default: hot index buckets collapse to their min-id rep, every
    colliding new doc is still flagged, pair volume is O(|new|)."""
    boiler = "terms of service apply to all users of this site please read"
    hist = spark.createDataFrame(
        [(i, boiler) for i in range(1500)]
        + [(50_000 + i, f"organic doc {i} about {i * 3}") for i in range(50)],
        "doc_id long, text string",
    )
    index = D.minhash_index(hist, "doc_id", "text", k=16, bands=4)
    batch = spark.createDataFrame(
        [(100_000 + i, boiler) for i in range(100)], "doc_id long, text string"
    )
    with pytest.warns(UserWarning, match="star-cap enabled"):
        flagged, _ = D.minhash_dedup_incremental(
            batch, index, "doc_id", "text", k=16, bands=4
        )
        got = flagged.collect()
    # every new doc flagged (gate completeness)...
    assert {r["new_id"] for r in got} == {100_000 + i for i in range(100)}
    # ...against the representative only, not 100 x 1500 pairs
    assert len(got) < 1000
    assert {r["old_id"] for r in got} == {0}
    # and the exact verify confirms the family through the rep
    verified, _ = D.minhash_dedup_incremental(
        batch, index, "doc_id", "text", k=16, bands=4, history=hist,
        max_bucket=1024,
    )
    assert verified.where(F.col("old_id") == 0).count() == 100


def test_minhash_incremental_capped_bucket_rescue_flags_non_rep_dup(spark):
    """r13 (ADVICE): a new doc whose true near-dup is a NON-REP member
    of a capped hot bucket must still be flagged when history
    verification is on — the rescue pass re-joins unverified hot-bucket
    colliders against the FULL bucket membership.  Constructed
    deterministically: the hot bucket is fabricated from one of the new
    doc's real (band, bh) rows, with the min-id rep's text UNRELATED to
    the new doc and a higher-id member a true near-dup."""
    new_df = _mk_docs(spark, [(100, _distinct_text(7))])
    one = D.minhash_index(new_df, "doc_id", "text").first()
    band, bh = one["band"], one["bh"]
    # bucket {1 (rep, unrelated), 2 (near-dup of 100), 3 (unrelated)}:
    # size 3 > max_bucket=2 -> hot -> capped join pairs 100 with rep 1
    # only, whose exact Jaccard FAILS — pre-rescue this doc went novel.
    index = spark.createDataFrame(
        [(band, bh, 1), (band, bh, 2), (band, bh, 3)],
        D.minhash_index(new_df, "doc_id", "text").schema,
    )
    near = _distinct_text(7).split()
    near[3] = "tweak"
    history = _mk_docs(
        spark,
        [(1, _distinct_text(111)), (2, " ".join(near)), (3, _distinct_text(333))],
    )
    verified, _ = D.minhash_dedup_incremental(
        new_df, index, "doc_id", "text", history=history, threshold=0.5,
        max_bucket=2,
    )
    pairs = {(r["new_id"], r["old_id"]) for r in verified.collect()}
    assert pairs == {(100, 2)}
    # a rep-verified new doc stays on the common path: rep pair only,
    # no rescue expansion into the rest of the bucket
    rep_dup = _distinct_text(111).split()
    rep_dup[5] = "edit"
    new2 = _mk_docs(spark, [(100, _distinct_text(7)), (200, " ".join(rep_dup))])
    one2 = D.minhash_index(
        _mk_docs(spark, [(200, " ".join(rep_dup))]), "doc_id", "text"
    ).first()
    index2 = index.unionByName(
        spark.createDataFrame(
            [(one2["band"], one2["bh"], 1), (one2["band"], one2["bh"], 2),
             (one2["band"], one2["bh"], 3)],
            index.schema,
        )
    ).distinct()
    verified2, _ = D.minhash_dedup_incremental(
        new2, index2, "doc_id", "text", history=history, threshold=0.5,
        max_bucket=2,
    )
    pairs2 = {(r["new_id"], r["old_id"]) for r in verified2.collect()}
    assert (200, 1) in pairs2 and (100, 2) in pairs2
    assert (200, 2) not in pairs2 and (200, 3) not in pairs2


def test_minhash_incremental_auto_probe_noop_on_cold_index(spark):
    """Cold index: auto resolves uncapped — flagged pairs equal the
    explicit max_bucket=None run exactly."""
    hist = spark.createDataFrame(
        [(i, f"history doc {i} with topic {i * 7}") for i in range(60)],
        "doc_id long, text string",
    )
    index = D.minhash_index(hist, "doc_id", "text", k=16, bands=4)
    batch = hist.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    auto, _ = D.minhash_dedup_incremental(batch, index, "doc_id", "text", k=16, bands=4)
    plain, _ = D.minhash_dedup_incremental(
        batch, index, "doc_id", "text", k=16, bands=4, max_bucket=None
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, plain.collect()))


# ------------------------------------------------------------- ann_eval


def _py_ann_eval(approx, exact, k):
    """Pure-python model: approx/exact are [(q, id, rank)] lists."""
    ex = {}
    for q, i, r in exact:
        if r <= k:
            ex.setdefault(q, {})[i] = r
    ap = {}
    for q, i, r in approx:
        if r <= k:
            ap.setdefault(q, {})[i] = r
    out = {}
    for q, truth in ex.items():
        got = ap.get(q, {})
        hits = [got[i] for i in truth if i in got]
        n_exact, n_hits = len(truth), len(hits)
        first = min(hits) if hits else None
        ex_top1 = [i for i, r in truth.items() if r == 1]
        top1 = int(
            bool(ex_top1) and got.get(ex_top1[0]) == 1
        )
        out[q] = (
            n_exact,
            n_hits,
            n_hits / n_exact,
            first,
            (1.0 / first) if first else 0.0,
            top1,
        )
    return out


def test_ann_eval_matches_python_model(spark):
    exact = [
        # q1: truth 10,11,12 (ranks 1..3)
        (1, 10, 1), (1, 11, 2), (1, 12, 3),
        # q2: truth 20,21 — approx returns nothing for it
        (2, 20, 1), (2, 21, 2),
        # q1 rank beyond k must be ignored on the truth side too
        (1, 19, 99),
    ]
    approx = [
        # q1: finds 11 at rank 1 and 10 at rank 4; 12 missed; 77 is a
        # false positive (not in truth)
        (1, 11, 1), (1, 77, 2), (1, 78, 3), (1, 10, 4),
        # q9: no ground truth -> dropped
        (9, 90, 1),
        # q1 approx rank beyond k ignored
        (1, 12, 42),
    ]
    a_df = spark.createDataFrame(approx, "q_id long, vec_id long, rank int")
    e_df = spark.createDataFrame(exact, "q_id long, vec_id long, rank int")
    got = {
        r["q_id"]: (
            r["n_exact"], r["n_hits"], r["recall"],
            r["first_hit_rank"], r["rr"], r["top1_hit"],
        )
        for r in S.ann_eval(a_df, e_df, k=10).collect()
    }
    want = _py_ann_eval(approx, exact, k=10)
    assert got == want  # exact, including the recall/rr doubles
    assert set(got) == {1, 2}  # q9 dropped, q2 evaluated at zero
    assert got[2] == (2, 0, 0.0, None, 0.0, 0)
    # q1: top-1 miss (exact #1 is 10, approx ranks it 4), 2 hits
    assert got[1] == (3, 2, 2.0 / 3.0, 1, 1.0, 0)

    s = S.ann_eval_summary(S.ann_eval(a_df, e_df, k=10)).first()
    assert s["n_queries"] == 2
    import math

    def favg(vals, scale=10**6):
        return sum(
            math.floor(v * scale + 0.5) for v in vals
        ) / scale / len(vals)

    assert s["recall_at_k"] == favg([v[2] for v in want.values()])
    assert s["mrr"] == favg([v[4] for v in want.values()])
    assert s["top1_rate"] == 0.0


def test_ann_eval_score_derivation_ties_break_by_id(spark):
    # score frames (no rank column): ranks derive by (score DESC, id).
    # q1 approx has a score tie between 11 and 12 -> 11 wins rank 1.
    e_df = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 90)], "q_id long, vec_id long, sim_fx long"
    )
    a_df = spark.createDataFrame(
        [(1, 12, 50), (1, 11, 50), (1, 10, 40)],
        "q_id long, vec_id long, sim_fx long",
    )
    row = S.ann_eval(a_df, e_df, k=2, score_col="sim_fx").first()
    # derived approx ranks: 11->1, 12->2, 10->3(cut at k=2)
    # derived exact ranks: 10->1, 11->2
    assert row["n_exact"] == 2 and row["n_hits"] == 1
    assert row["first_hit_rank"] == 1 and row["top1_hit"] == 0
    # frame with neither rank nor score column fails fast
    with pytest.raises(ValueError, match="neither rank"):
        S.ann_eval(
            a_df.drop("sim_fx"), e_df, k=2, score_col="sim_fx"
        ).collect()


def test_ann_eval_perfect_ranking_and_plan(spark):
    rows = [(1, 10, 1), (1, 11, 2)]
    df = spark.createDataFrame(rows, "q_id long, vec_id long, rank int")
    row = S.ann_eval(df, df, k=2).first()
    assert row["recall"] == 1.0 and row["rr"] == 1.0 and row["top1_hit"] == 1
    # eval-sized plan: pure JVM, no Python stage, no single-partition
    # funnel — the joins/groupBy key on q_id
    plan = (
        S.ann_eval(df, df, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ann_eval_score_derivation_two_phase_partition_invariant(spark):
    """The score->rank derivation's local pre-top-k must not change
    results under any partitioning: ranks derived from an 8-partition
    scored frame equal the 1-partition derivation exactly (any global
    top-k row survives its partition-local top-k by construction)."""
    rows = [
        (q, i, (i * 7919 + q * 104729) % 1000)
        for q in (1, 2, 3)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "q_id long, vec_id long, sim_fx long")
    exact = df  # grade the ranking against itself at k=5
    one = sorted(
        map(
            tuple,
            S.ann_eval(
                df.coalesce(1), exact.coalesce(1), k=5, score_col="sim_fx"
            ).collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            S.ann_eval(
                df.repartition(8), exact.repartition(8), k=5,
                score_col="sim_fx",
            ).collect(),
        )
    )
    assert one == many
    # self-graded: perfect by construction
    for r in S.ann_eval(df, exact, k=5, score_col="sim_fx").collect():
        assert r["recall"] == 1.0 and r["top1_hit"] == 1


def test_ann_eval_duplicate_rows_do_not_inflate_counts(spark):
    """ADVICE r15: duplicate (q_id, id) rows in either input used to
    multiply through the left join and silently inflate
    n_exact/n_hits.  _ranked now collapses dups to their best rank,
    so a duplicated truth row / a repeated approx row grade exactly
    like the clean frames."""
    clean_exact = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    clean_approx = [(1, 11, 1), (1, 77, 2), (1, 10, 3)]
    dup_exact = clean_exact + [(1, 10, 1), (1, 11, 2)]
    dup_approx = clean_approx + [(1, 11, 1), (1, 11, 5)]
    sch = "q_id long, vec_id long, rank int"
    want = S.ann_eval(
        spark.createDataFrame(clean_approx, sch),
        spark.createDataFrame(clean_exact, sch),
        k=10,
    ).first()
    got = S.ann_eval(
        spark.createDataFrame(dup_approx, sch),
        spark.createDataFrame(dup_exact, sch),
        k=10,
    ).first()
    assert got.asDict() == want.asDict()
    assert got["n_exact"] == 3 and got["n_hits"] == 2
