"""Training-data curation operators (operators/pipeline.py): quota
capping, deterministic hash splits, PII masking, decontamination."""

import pyspark.sql.functions as F
import pytest

from gcf_corima_parquet_converter_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", f"doc {i} body " * (1 + i % 4)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_source_quota_caps_and_is_deterministic(spark, docs):
    kept = P.source_quota(docs, "source", cap=5, order_col="doc_id")
    pdf = kept.toPandas()
    assert pdf.groupby("source").size().max() == 5
    # first-by-order semantics: src0 keeps doc_ids 0,3,6,9,12
    assert sorted(pdf[pdf.source == "src0"].doc_id) == [0, 3, 6, 9, 12]


def test_source_quota_pre_rank_parity(spark, docs):
    """pre_rank local cap must not change the result, only the shuffle."""
    a = P.source_quota(docs, "source", cap=7, order_col="doc_id")
    b = P.source_quota(docs.repartition(8), "source", cap=7, order_col="doc_id",
                       pre_rank=True)
    assert sorted(a.toPandas().doc_id) == sorted(b.toPandas().doc_id)


def test_hash_split_stable_and_exhaustive(spark, docs):
    s1 = P.hash_split(docs, "doc_id", salt="s").toPandas()
    s2 = P.hash_split(docs, "doc_id", salt="s").toPandas()
    assert (s1.sort_values("doc_id").split.values
            == s2.sort_values("doc_id").split.values).all()
    assert set(s1.split) <= {"train", "val", "test"}
    assert s1.split.isna().sum() == 0
    # different salt re-deals at least one doc
    s3 = P.hash_split(docs, "doc_id", salt="other").toPandas()
    assert (s1.sort_values("doc_id").split.values
            != s3.sort_values("doc_id").split.values).any()
    # no shuffle: a pure narrow map keeps the input partitioning
    plan = P.hash_split(docs, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or call +1 (555) 123-4567"),
            (2, "server 10.0.42.7 leaked ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    out = {r.id: r for r in P.redact_pii(df, "text").collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "[EMAIL]" in out[1].text and "[PHONE]" in out[1].text
    assert "jo.doe" not in out[1].text and "555" not in out[1].text
    assert out[2].n_ipv4 == 1 and out[2].n_ssn == 1
    assert "[IPV4]" in out[2].text and "[SSN]" in out[2].text
    assert out[3].text == "nothing sensitive here"
    assert out[3].n_email == out[3].n_phone == 0


def test_mask_terms_counts_before_masking(spark):
    df = spark.createDataFrame([(1, "a b a c a")], "id long, text string")
    out = P.mask_terms(df, "text", {"hit": r"\ba\b"}, token="[X]",
                       out_col="masked").collect()[0]
    assert out.n_hit == 3
    assert out.masked == "[X] b [X] c [X]"
    assert out.text == "a b a c a"  # original kept when out_col differs


def test_ngram_contamination_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta epsilon y"),  # shares one 5-gram
            (2, "completely unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    got = P.ngram_contamination(corpus, bench, "doc_id", "text", n=5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.corpus_id, r.bench_id) == (1, 100)
    assert r.n_overlap_grams == 1  # "alpha beta gamma delta epsilon"


def test_ngram_contamination_broadcasts_benchmark(spark, docs):
    bench = docs.where(F.col("doc_id") < 3)
    plan = (
        P.ngram_contamination(docs, bench, "doc_id", "text", n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pipeline_ops_null_robustness(spark):
    """Null text/ids must flow through, not crash: masking keeps the
    null, counts stay null (not 0 — unknown input, unknown count), and
    null ids deterministically land in the 'test' split (the otherwise
    branch), never in training data."""
    df = spark.createDataFrame(
        [(1, None), (None, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in P.redact_pii(df, "text").collect()}
    assert out[1].text is None and out[1].n_email is None
    split = {r.doc_id: r.split for r in P.hash_split(df, "doc_id").collect()}
    assert split[None] == "test"


def test_quantile_threshold_filter(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, score double")
    kept = P.quantile_threshold_filter(df, "score", q=0.10, exact=True).toPandas()
    # p10 of 0..99 (interpolated) = 9.9 -> keep scores >= 9.9 -> ids 10..99
    assert sorted(kept.id) == list(range(10, 100))
    worst = P.quantile_threshold_filter(df, "score", q=0.10, keep="below",
                                        exact=True).toPandas()
    assert sorted(worst.id) == list(range(0, 10))
    # approx path: same shape on uniform data, no crash
    approx = P.quantile_threshold_filter(df, "score", q=0.10).toPandas()
    assert 80 <= len(approx) <= 95


def test_shuffle_shards_deterministic_across_partitioning(spark, sf_dir):
    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators import pipeline as P

    d = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    a = P.shuffle_shards(d, 8, "doc_id", seed="s1")
    b = P.shuffle_shards(d.repartition(17), 8, "doc_id", seed="s1")
    assign_a = {r["doc_id"]: r["shard"] for r in a.collect()}
    assign_b = {r["doc_id"]: r["shard"] for r in b.collect()}
    assert assign_a == assign_b  # partitioning-independent, unlike rand()
    assert set(assign_a.values()) == set(range(8))
    # a different seed re-deals the shuffle
    c = {r["doc_id"]: r["shard"] for r in
         P.shuffle_shards(d, 8, "doc_id", seed="s2").collect()}
    assert c != assign_a


def test_shuffle_shards_order_is_local_sort_only(spark, sf_dir):
    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators import pipeline as P

    d = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = P.shuffle_shards(d, 4, "doc_id", keep_order_col=True)
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    # one hash exchange for shard co-location, NO range exchange (a
    # global sort would be a second, avoidable shuffle)
    assert "rangepartitioning" not in plan.lower(), plan[:1500]
    assert "Sort [" in plan  # the intra-partition order sort is there
    # within every partition rows are ordered by the shuffle hash
    import numpy as np

    def check(it):
        for pdf in it:
            # several shards may share a task (hash(shard)%n is not a
            # bijection); each shard's run must be contiguous + ordered
            for _, grp in pdf.groupby("shard", sort=False):
                assert grp["_shuffle_order"].is_monotonic_increasing
                assert (grp.index.to_numpy() == np.arange(
                    grp.index[0], grp.index[0] + len(grp))).all()
            yield pdf[["doc_id"]]

    n = sharded.mapInPandas(check, "doc_id long").count()
    assert n == d.count()


def test_pack_sequences_budget_and_coverage(spark, sf_dir):
    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators import pipeline as P
    from gcf_corima_parquet_converter_spark.operators.text import token_count

    d = (
        catalog.load(spark, sf_dir, "documents")
        .select("doc_id", token_count("text").alias("n_tokens"))
    )
    packed = P.pack_sequences(d, budget=256, id_col="doc_id",
                              token_col="n_tokens", n_workers=8)
    rows = packed.collect()
    assert len(rows) == d.count()  # every doc packed exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)
    fills = {}
    for r in rows:
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tokens"]
    over = {p: f for p, f in fills.items() if f > 256}
    # only singleton oversize docs may exceed the budget
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r["pack_id"], []).append(r)
    for p in over:
        assert len(per_pack[p]) == 1 and per_pack[p][0]["n_tokens"] > 256
    # pack positions are the running fill offsets
    for p, members in per_pack.items():
        members.sort(key=lambda r: r["pack_pos"])
        run = 0
        for m in members:
            assert m["pack_pos"] == run
            run += m["n_tokens"]


def test_pack_sequences_deterministic_across_partitioning(spark, sf_dir):
    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators import pipeline as P
    from gcf_corima_parquet_converter_spark.operators.text import token_count

    d = (
        catalog.load(spark, sf_dir, "documents")
        .select("doc_id", token_count("text").alias("n_tokens"))
    )
    a = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in
         P.pack_sequences(d, 512, "doc_id", "n_tokens", n_workers=4).collect()}
    b = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in
         P.pack_sequences(d.repartition(13), 512, "doc_id", "n_tokens",
                          n_workers=4).collect()}
    assert a == b


def test_pack_sequences_state_survives_arrow_batch_splits(spark):
    """mapInPandas streams a partition as multiple Arrow batches; the
    greedy state must persist across them or pack ids collide and packs
    blow the budget (round-2 VERDICT 'What's wrong #1')."""
    from gcf_corima_parquet_converter_spark.operators import pipeline as P

    rows = [(i, 40 + (i * 7) % 90) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "50")  # 300 docs / 2 workers >> 50 rows/batch
        small = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in
                 P.pack_sequences(d, 256, "doc_id", "n_tokens",
                                  n_workers=2).collect()}
        spark.conf.set(key, "100000")  # single batch per partition
        big = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in
               P.pack_sequences(d, 256, "doc_id", "n_tokens",
                                n_workers=2).collect()}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # batch-boundary invariance: tiny batches == one big batch
    assert small == big
    # and every multi-member pack respects the budget
    fills, sizes = {}, {}
    n_tok = dict(rows)
    for doc, (pack, _pos) in small.items():
        fills[pack] = fills.get(pack, 0) + n_tok[doc]
        sizes[pack] = sizes.get(pack, 0) + 1
    for pack, f in fills.items():
        assert f <= 256 or sizes[pack] == 1


def test_pack_sequences_rejects_bad_budget(spark, sf_dir):
    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators import pipeline as P

    d = catalog.load(spark, sf_dir, "documents").select("doc_id")
    with pytest.raises(ValueError):
        P.pack_sequences(d.withColumn("t", F.lit(1)), 0, "doc_id", "t")


def test_weighted_sample_determinism_and_bias(spark, sf_dir):
    from gcf_corima_parquet_converter_spark import catalog
    from gcf_corima_parquet_converter_spark.operators.pipeline import weighted_sample

    d = catalog.load(spark, sf_dir, "documents")
    a = weighted_sample(d, "doc_id", "n_chars", fraction=0.5, salt="x")
    b = weighted_sample(d, "doc_id", "n_chars", fraction=0.5, salt="x")
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # same salt -> identical keep set
    resalted = weighted_sample(d, "doc_id", "n_chars", fraction=0.5, salt="y")
    ids_c = sorted(r["doc_id"] for r in resalted.select("doc_id").collect())
    assert ids_a != ids_c  # salt re-deals
    n = d.count()
    assert 0.3 * n <= len(ids_a) <= 0.7 * n  # expected ~fraction of rows
    # weight-proportional: kept rows skew long (higher n_chars)
    import pyspark.sql.functions as F

    mean_all = d.agg(F.avg("n_chars")).collect()[0][0]
    mean_kept = a.agg(F.avg("n_chars")).collect()[0][0]
    assert mean_kept > mean_all
    # flag mode keeps every row, adds the boolean
    flagged = weighted_sample(d, "doc_id", "n_chars", 0.5, salt="x", keep_col="keep")
    assert flagged.count() == n
    assert flagged.where("keep").count() == len(ids_a)


def test_length_buckets_padding_math(spark):
    from gcf_corima_parquet_converter_spark.operators.pipeline import length_buckets

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e"), (3, " ".join(["t"] * 40)), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["bucket"]: r
        for r in length_buckets(df, "doc_id", "text", bucket_size=32).collect()
    }
    # docs 1 (3 tok) and 2 (5 tok) share bucket 0: max 5, waste 2*5-8=2
    assert got[0]["n_docs"] == 2 and got[0]["bucket_max"] == 5
    assert got[0]["padding_waste"] == 2
    # doc 3 (40 tok) -> bucket 1, waste 0; null doc excluded
    assert got[1]["n_docs"] == 1 and got[1]["padding_waste"] == 0
    assert sum(r["n_docs"] for r in got.values()) == 3


def test_stratified_sample_exact_counts_and_determinism(spark):
    from gcf_corima_parquet_converter_spark.operators.pipeline import (
        stratified_sample,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = stratified_sample(df, "lang", 7, "doc_id", salt="s")
    from collections import Counter

    counts = Counter(r["lang"] for r in s1.collect())
    assert counts == {"en": 7, "de": 7}
    # deterministic under re-evaluation and repartitioning
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(13), "lang", 7, "doc_id", salt="s"
        ).collect()
    )
    assert ids1 == ids2
    # small groups yield all their rows
    tiny = spark.createDataFrame([(1, "xx"), (2, "xx")], "doc_id long, lang string")
    assert stratified_sample(tiny, "lang", 7, "doc_id").count() == 2
    # salt re-deals
    ids3 = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", 7, "doc_id", salt="t").collect()
    )
    assert ids1 != ids3


def test_stratified_sample_pre_rank_parity_and_plan(spark):
    """pre_rank's map-side cap must not change the sample (subset
    argument: local top-n >= global top-n), only insert the local
    Window before the per-group shuffle."""
    from gcf_corima_parquet_converter_spark.operators.pipeline import (
        stratified_sample,
    )

    rows = [(i, "hot" if i % 10 else "cold") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", 9, "doc_id", salt="s").collect()
    )
    pre = stratified_sample(
        df.repartition(8), "lang", 9, "doc_id", salt="s", pre_rank=True
    )
    assert a == sorted(r["doc_id"] for r in pre.collect())
    # the local cap is a Window keyed by spark_partition_id BEFORE the
    # group exchange — visible in the physical plan; absent by default
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    base = stratified_sample(df, "lang", 9, "doc_id", salt="s")
    assert "SPARK_PARTITION_ID" not in (
        base._jdf.queryExecution().executedPlan().toString().upper()
    )


def test_mixture_audit_epochs_table(spark):
    """The audit frame computes the loader's repeat decision: an
    undersized source keeps everything (frac 1) and repeats >1x; an
    oversized one subsamples and repeats exactly 1; an unweighted one
    drops (target 0)."""
    from gcf_corima_parquet_converter_spark.operators.pipeline import (
        mixture_audit,
        mixture_sample,
    )

    rows = (
        [(i, "small", 10) for i in range(10)]          # 100 tokens
        + [(100 + i, "big", 100) for i in range(20)]   # 2000 tokens
        + [(900 + i, "unlisted", 50) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    weights = {"small": 0.5, "big": 0.5}
    aud = {
        r["source"]: r
        for r in mixture_audit(df, "source", "n_tok", weights, 1000).collect()
    }
    small, big, un = aud["small"], aud["big"], aud["unlisted"]
    # small: target 500 > available 100 -> keep all, repeat 5x
    assert small["src_tokens"] == 100 and small["target_tokens"] == 500.0
    assert small["keep_frac"] == 1.0 and small["implied_repeat"] == 5.0
    assert small["achieved_tokens"] == 100.0 and small["achieved_share"] == 0.1
    # big: target 500 < available 2000 -> subsample 1/4, one epoch
    assert big["keep_frac"] == 0.25 and big["implied_repeat"] == 1.0
    assert big["achieved_tokens"] == 500.0
    # unlisted: target 0, dropped by the sampler
    assert un["target_share"] == 0.0 and un["keep_frac"] == 0.0
    assert un["achieved_tokens"] == 0.0
    # the audit's keep_frac is exactly what mixture_sample applies:
    # an undersized source keeps every row
    kept = mixture_sample(df, "source", "doc_id", "n_tok", weights, 1000)
    assert kept.where(F.col("source") == "small").count() == 10
    assert kept.where(F.col("source") == "unlisted").count() == 0


def test_mixture_sample_shares_and_determinism(spark):
    from gcf_corima_parquet_converter_spark.operators.pipeline import mixture_sample

    rows = [(i, "web" if i < 800 else ("wiki" if i < 900 else "junk"), 10)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = mixture_sample(
        df, "source", "doc_id", "n_tok", {"web": 0.5, "wiki": 0.5}, 4000
    )
    from collections import Counter

    kept = Counter(r["source"] for r in out.collect())
    # web: target 2000 tok of 8000 -> ~25% of 800 docs; wiki: target
    # 2000 of 1000 available -> frac capped at 1, ALL kept; junk: no
    # weight -> dropped entirely
    assert kept["wiki"] == 100
    assert "junk" not in kept
    assert 150 <= kept["web"] <= 250
    # deterministic under repartitioning; salt re-deals
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(7), "source", "doc_id", "n_tok",
            {"web": 0.5, "wiki": 0.5}, 4000,
        ).collect()
    )
    assert ids1 == ids2
    ids3 = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df, "source", "doc_id", "n_tok", {"web": 0.5, "wiki": 0.5}, 4000,
            salt="B",
        ).collect()
    )
    assert ids1 != ids3


def test_mixture_sample_zero_token_and_unweighted_sources_drop(spark):
    """A source with 0/NULL token totals must not collapse its fraction
    to 1.0 through least()'s null-skipping — it and unweighted sources
    drop entirely."""
    from gcf_corima_parquet_converter_spark.operators.pipeline import mixture_sample

    df = spark.createDataFrame(
        [(1, "web", 10), (2, "empty", 0), (3, "empty", 0), (4, "nul", None)],
        "doc_id long, source string, n_tok long",
    )
    kept = {r["source"] for r in
            mixture_sample(df, "source", "doc_id", "n_tok", {"web": 1.0, "empty": 0.0}, 100).collect()}
    assert kept == {"web"}


# ------------------------------------------- global running sum / budget


def test_global_running_sum_matches_single_window(spark):
    import random

    from pyspark.sql import Window

    rng = random.Random(3)
    rows = [(i, rng.randint(1, 500)) for i in range(5_000)]
    df = spark.createDataFrame(rows, "id long, tok long")
    got = {
        r["id"]: r["running_sum"]
        for r in P.global_running_sum(
            df.repartition(13), [F.col("tok").desc(), F.col("id")], "tok",
            n_partitions=8,
        ).collect()
    }
    # naive single-reducer reference
    w = Window.orderBy(F.col("tok").desc(), F.col("id"))
    ref = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("tok").over(w)).collect()
    }
    assert got == ref


def test_global_running_sum_no_single_partition_exchange(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 37).alias("tok")
    )
    # materialize="cache" exposes the raw decomposition plan (default
    # "checkpoint" truncates lineage to an ExistingRDD scan)
    out = P.global_running_sum(df, [F.col("tok").desc(), F.col("id")], "tok",
                               n_partitions=4, materialize="cache")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the per-range window is keyed, not global
    assert "_range_id" in plan
    spark.catalog.clearCache()  # the documented "cache"-mode contract


def test_global_running_sum_checkpoint_mode_leaves_no_session_cache(spark):
    """Default materialize="checkpoint": the correctness-critical
    intermediate cache must NOT outlive the call — only the returned
    DataFrame's own (GC-scoped) checkpoint storage may remain."""
    jsc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    base = jsc.getPersistentRDDs().size()
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 17 + 1).alias("tok")
    )
    out = P.global_running_sum(df, [F.col("id")], "tok", n_partitions=4)
    after = jsc.getPersistentRDDs().size()
    # at most the checkpoint RDD itself — the intermediate is gone
    assert after - base <= 1
    # the eager checkpoint already ran the pipeline; results are exact
    rows = out.orderBy("id").limit(3).collect()
    assert [r["running_sum"] for r in rows] == [1, 3, 6]
    # caller-visible storage is released with the DataFrame (context
    # cleaner, GC-driven — poll briefly)
    import gc
    import time as _t

    del out, rows
    # under full-suite load the context cleaner can lag well past the
    # old 30s window (observed r16: isolated pass, suite-run timeout)
    # — the property is eventual release, so poll generously
    for _ in range(240):
        gc.collect()  # release the py4j handle...
        spark.sparkContext._jvm.System.gc()  # ...then let the cleaner see it
        if jsc.getPersistentRDDs().size() <= base:
            break
        _t.sleep(0.5)
    assert jsc.getPersistentRDDs().size() <= base


def test_budget_select_maximal_prefix(spark):
    rows = [(1, 10, 100), (2, 9, 100), (3, 8, 100), (4, 7, 100), (5, 6, 100)]
    df = spark.createDataFrame(rows, "doc_id long, score long, tok long")
    kept = P.budget_select(df, "score", "tok", 250, "doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]  # 300 would exceed
    assert all(r["cum_tokens"] <= 250 for r in kept)
    # budget below the best doc -> empty; huge budget -> everything
    assert P.budget_select(df, "score", "tok", 50, "doc_id").count() == 0
    assert P.budget_select(df, "score", "tok", 10_000, "doc_id").count() == 5


def test_global_running_sum_negative_values(spark):
    # partition totals must be sum(value), not max(cumsum) — negatives
    # make the two differ
    import random

    from pyspark.sql import Window

    rng = random.Random(11)
    rows = [(i, rng.randint(-200, 200)) for i in range(3_000)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["running_sum"]
        for r in P.global_running_sum(
            df, [F.col("id")], "v", n_partitions=6
        ).collect()
    }
    w = Window.orderBy("id")
    ref = {
        r["id"]: r["c"] for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    assert got == ref


def test_corpus_diff_statuses(spark):
    v1 = spark.createDataFrame(
        [(1, "keep"), (2, "drop-me"), (3, "keep2")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(10, "keep"), (11, "keep2"), (12, "brand new")],
        "doc_id long, text string",
    )
    by_status = {}
    for r in P.corpus_diff(v1, v2, ["text"], "doc_id").collect():
        by_status.setdefault(r["status"], []).append(r)
    assert len(by_status["retained"]) == 2
    [rm] = by_status["removed"]
    assert rm["old_id"] == 2 and rm["new_id"] is None
    [ad] = by_status["added"]
    assert ad["new_id"] == 12 and ad["old_id"] is None
    # retained rows carry both sides' ids
    assert all(r["old_id"] is not None and r["new_id"] is not None
               for r in by_status["retained"])


def test_apply_corpus_update_merge_semantics(spark):
    """MERGE INTO semantics: matched update, unmatched insert, tombstone
    delete — including the idempotent delete of a never-existed id."""
    base = spark.createDataFrame(
        [(1, "one", 10), (2, "two", 20), (3, "three", 30)],
        "id long, txt string, score long",
    )
    upd = spark.createDataFrame(
        [
            (2, "TWO", 22, False),   # update
            (3, None, 0, True),      # delete
            (4, "four", 40, False),  # insert
            (9, None, 0, True),      # delete of a missing id: no-op
        ],
        "id long, txt string, score long, del boolean",
    )
    got = {
        r["id"]: (r["txt"], r["score"])
        for r in P.apply_corpus_update(base, upd, "id", delete_col="del").collect()
    }
    assert got == {1: ("one", 10), 2: ("TWO", 22), 4: ("four", 40)}

    # without delete_col: pure upsert
    up2 = spark.createDataFrame(
        [(1, "ONE", 11), (5, "five", 50)], "id long, txt string, score long"
    )
    got2 = {
        r["id"]: (r["txt"], r["score"])
        for r in P.apply_corpus_update(base, up2, "id").collect()
    }
    assert got2 == {
        1: ("ONE", 11), 2: ("two", 20), 3: ("three", 30), 5: ("five", 50)
    }
    # output schema preserves base column order
    assert P.apply_corpus_update(base, up2, "id").columns == base.columns

    import pytest as _pt

    with _pt.raises(ValueError, match="missing data columns"):
        P.apply_corpus_update(base, up2.drop("score"), "id")


def test_apply_corpus_update_null_update_values(spark):
    """An update row may legitimately set a column to NULL; that must
    not be confused with 'no update' (the when() guards on the match
    marker, not on value nullness)."""
    base = spark.createDataFrame([(1, "x")], "id long, txt string")
    upd = spark.createDataFrame([(1, None)], "id long, txt string")
    [r] = P.apply_corpus_update(base, upd, "id").collect()
    assert r["txt"] is None


def test_group_quantile_filter_exact_and_small_groups(spark):
    rows = (
        [(i, "big", float(i)) for i in range(100)]
        + [(200 + i, "small", float(i)) for i in range(3)]
        + [(300, "solo", 1.0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, g string, score double")
    kept = P.group_quantile_filter(df, ["g"], "score", 0.3, "doc_id")
    got = {r["g"]: sorted(rr["doc_id"] for rr in kept.collect()
                          if rr["g"] == r["g"]) for r in kept.collect()}
    # big: top 30 scores = ids 70..99
    assert got["big"] == list(range(70, 100))
    # small: ceil(0.3*3)=1 -> best id 202 (score 2.0)
    assert got["small"] == [202]
    # solo groups always keep their row
    assert got["solo"] == [300]

    worst = P.group_quantile_filter(df, ["g"], "score", 0.3, "doc_id",
                                    keep="worst")
    w = sorted(r["doc_id"] for r in worst.collect() if r["g"] == "big")
    assert w == list(range(0, 30))

    # deterministic tiebreak: equal scores resolve by id
    ties = spark.createDataFrame(
        [(i, "t", 1.0) for i in range(10)], "doc_id long, g string, score double"
    )
    t = sorted(r["doc_id"] for r in
               P.group_quantile_filter(ties, ["g"], "score", 0.5, "doc_id").collect())
    assert t == [0, 1, 2, 3, 4]

    # mathematical ceil, not double-crumb ceil: 0.1 * 30 computes to
    # 3.0000000000000004 in binary, which a raw CEIL lifts to 4 — the
    # contract is ceil(frac*n) = 3 (r6 advice)
    thirty = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(30)],
        "doc_id long, g string, score double",
    )
    k = P.group_quantile_filter(thirty, ["g"], "score", 0.1, "doc_id")
    assert k.count() == 3


def test_storage_curation_capstone_composition(spark, tmp_path):
    """End-to-end composition of the r6 storage tier with curation:
    fragmented table -> file_stats -> prune_files -> conform_schema ->
    apply_corpus_update -> dedup + split; the result equals the same
    logic computed naively over the full data."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from gcf_corima_parquet_converter_spark.operators import dedup as D
    from gcf_corima_parquet_converter_spark.operators import scale as SC
    from gcf_corima_parquet_converter_spark.schema.sanitize import (
        conform_schema,
    )

    tbl = str(tmp_path / "corpus")
    base_rows = [(i, f"text body {i % 40}", i % 1000) for i in range(4000)]
    spark.createDataFrame(
        base_rows, "doc_id long, text string, n_chars long"
    ).repartitionByRange(8, "n_chars").write.parquet(tbl)

    # stats-driven pruning on n_chars: kept files must cover all
    # matching rows
    stats = SC.file_stats(spark.read.parquet(tbl), ["n_chars"])
    kept = [r["file"].replace("file:", "")
            for r in SC.prune_files(stats, "n_chars", lo=100, hi=299).collect()]
    assert 0 < len(kept) < 8
    pruned = spark.read.parquet(*kept).where(
        F.col("n_chars").between(100, 299)
    )
    assert pruned.count() == sum(1 for _, _, nc in base_rows
                                 if 100 <= nc <= 299)

    # an older producer's batch: missing n_chars, stringly doc_id
    target = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n_chars", LongType()),
    ])
    legacy = spark.createDataFrame(
        [("9001", "new doc alpha"), ("9002", "new doc beta")],
        "doc_id string, text string",
    )
    updates = conform_schema(legacy, target).withColumn("del", F.lit(False))
    merged = P.apply_corpus_update(
        pruned, updates, "doc_id", delete_col="del"
    )
    assert merged.count() == pruned.count() + 2

    # curation over the merged snapshot: dedup repeated bodies + split
    deduped = D.exact_dedup(merged, ["text"], "doc_id")
    split = P.hash_split(deduped, "doc_id", salt="cap")
    agg = {r["split"]: r["count"]
           for r in split.groupBy("split").count().collect()}
    assert sum(agg.values()) == deduped.count()
    assert set(agg) <= {"train", "val", "test"}
    # dedup kept exactly one row per distinct text
    assert deduped.count() == merged.select("text").distinct().count()


def test_bloom_ngram_decontaminate_matches_flag_operator(spark, sf_dir):
    """EXACT parity: the bloom-path DROP must keep precisely the docs
    the flag operator (ngram_contamination) leaves unflagged — same
    gram kernel, same NOT-EXISTS semantics, only the plan differs."""
    from gcf_corima_parquet_converter_spark import catalog

    docs = catalog.load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    flagged = (
        P.ngram_contamination(corpus, bench, "doc_id", "text", n=4)
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    want = sorted(
        r["doc_id"]
        for r in corpus.join(flagged, "doc_id", "left_anti").collect()
    )
    got = sorted(
        r["doc_id"]
        for r in P.bloom_ngram_decontaminate(
            corpus, bench, "doc_id", "text", n=4, fpp=0.001
        ).collect()
    )
    assert got == want and got


def test_bloom_ngram_decontaminate_reuses_prebuilt_bloom(spark):
    """A suite's filter artifact amortizes across corpora: prebuilt
    bloom gives the same answer, and the benchmark grams are still
    verified exactly (no fpp leakage into the final drop set)."""
    from gcf_corima_parquet_converter_spark.operators import membership as B
    from gcf_corima_parquet_converter_spark.operators.dedup import (
        _shingles,
        _tokenized,
    )

    rows = [(i, f"alpha beta gamma delta epsilon {i} zeta") for i in range(50)]
    rows += [(100 + i, f"unrelated text number {i} here okay") for i in range(20)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon 7 zeta")], "doc_id long, text string"
    )
    toked = _tokenized(bench, "doc_id", "text")
    bg = toked.select(
        F.explode(_shingles(F.col("_toks"), 4)).alias("gram")
    ).distinct()
    bloom = B.bloom_build(bg, "gram", fpp=0.001)
    out = P.bloom_ngram_decontaminate(
        corpus, bench, "doc_id", "text", n=4, bloom=bloom
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # every "alpha beta gamma delta" doc shares the 4-gram -> dropped;
    # the unrelated docs all survive
    assert kept == sorted(100 + i for i in range(20))


def test_contaminated_spans_and_strip(spark):
    """Planted benchmark quote inside a long doc: the span covers
    exactly the quoted window run; the strip removes it and keeps the
    rest; uncontaminated docs pass through byte-untouched."""
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "intro words here the quick brown fox jumps over the lazy dog tonight and more trailing content"),
            (2, "completely unrelated document text with other words entirely"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    spans = P.contaminated_spans(docs, bench, "doc_id", "text", width=8).collect()
    assert {r["doc_id"] for r in spans} == {1}
    [s] = spans
    # quote starts at token 3; 10-token quote -> windows at 3..5, span [3, 13)
    assert (s["span_start"], s["span_end"]) == (3, 13)
    out = {r["doc_id"]: r["text"] for r in P.strip_contaminated_spans(
        docs, bench, "doc_id", "text", width=8
    ).collect()}
    assert out[1] == "intro words here and more trailing content"
    assert out[2] == "completely unrelated document text with other words entirely"
    assert out[3] is None  # null text passes through

    # unbroadcast path: identical result for suites past the broadcast limit
    out2 = {r["doc_id"]: r["text"] for r in P.strip_contaminated_spans(
        docs, bench, "doc_id", "text", width=8, broadcast_benchmark=False
    ).collect()}
    assert out2 == out


def test_contamination_report_attributes_benchmark_sources(spark):
    """r12 provenance: each contaminated doc maps to the benchmark
    doc(s) it quotes, with window counts and span bounds; a passage
    present in TWO benchmark docs attributes to both; clean and
    null/empty docs produce no rows."""
    bench = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            # doc 3 shares its window set with doc 1's tail
            (3, "beta gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "x alpha beta gamma delta epsilon y"),   # quotes bench 1
            (11, "start one two three four five end"),    # quotes bench 2
            (12, "beta gamma delta epsilon zeta trail"),  # quotes bench 1 AND 3
            (13, "totally clean document here"),
            (14, None),
            (15, "   "),
        ],
        "doc_id long, text string",
    )
    rep = P.contamination_report(corpus, bench, "doc_id", "text", width=5)
    got = {
        (r["doc_id"], r["bench_id"]): (
            r["n_windows"], r["first_pos"], r["last_pos"]
        )
        for r in rep.collect()
    }
    assert (10, 1) in got and got[(10, 1)] == (1, 1, 6)
    assert (11, 2) in got and got[(11, 2)] == (1, 1, 6)
    # doc 12's window "beta gamma delta epsilon zeta" exists in bench 1
    # (positions 1..5) AND bench 3 (positions 0..4): both attributed
    assert (12, 1) in got and (12, 3) in got
    assert {d for d, _ in got} == {10, 11, 12}


def test_semantic_decontaminate_broadcast_and_lsh_paths(spark):
    """r12 embedding-space decontamination: planted benchmark copies
    (cos=1) drop on BOTH paths, organic vectors survive, null
    embeddings pass through; the broadcast plan never shuffles the
    corpus."""
    import numpy as np

    rng = np.random.default_rng(5)
    def unit(v):
        v = v / np.linalg.norm(v)
        return [float(x) for x in v]

    bench_rows = [(i, unit(rng.normal(size=16))) for i in range(5)]
    bench = spark.createDataFrame(
        bench_rows, "vec_id long, embedding array<double>"
    )
    corpus_rows = [
        (100 + i, unit(rng.normal(size=16))) for i in range(60)
    ]
    # planted contamination: exact copies of every benchmark vector
    corpus_rows += [(1000 + i, v) for i, v in bench_rows]
    corpus_rows.append((9999, None))
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    bc = P.semantic_decontaminate(corpus, bench, threshold=0.95)
    got_bc = {r["vec_id"] for r in bc.collect()}
    assert not any(1000 <= v < 2000 for v in got_bc)  # plants dropped
    assert 9999 in got_bc  # null embedding survives
    assert len(got_bc) >= 55  # organic vectors overwhelmingly survive

    lsh = P.semantic_decontaminate(
        corpus, bench, threshold=0.95, broadcast_benchmark=False,
        n_planes=6, n_tables=8, dim=16,
    )
    got_lsh = {r["vec_id"] for r in lsh.collect()}
    # exact copies collide in every table -> all plants recalled
    assert not any(1000 <= v < 2000 for v in got_lsh)
    assert 9999 in got_lsh
    # precision exact on both paths: anything LSH kept, broadcast kept
    assert got_bc <= got_lsh

    # r13 plan contract (matched-id broadcast-back): the quadratic
    # dot-product probe is an INNER NLJ (a direct LeftAnti NLJ cannot
    # be parallelism-guarded — PushDownLeftSemiAntiJoin shoves it below
    # any Repartition), the flagged-id set broadcasts into an equi
    # anti-join, and the only ENSURE_REQUIREMENTS hash exchange carries
    # bare ids (the distinct), never the embedding payload.
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin BuildRight, Inner" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin BuildRight, LeftAnti" not in plan
    for line in plan.splitlines():
        if (
            "Exchange hashpartitioning" in line
            and "REPARTITION_BY_NUM" not in line
        ):
            assert "embedding" not in line, line

    # r18: semantic_contaminated_ids is the flagged-id half of the
    # drop — corpus minus survivors, on BOTH paths (the q111
    # anti-join restructure rests on this identity)
    flagged_bc = {
        r["vec_id"]
        for r in P.semantic_contaminated_ids(
            corpus, bench, threshold=0.95
        ).collect()
    }
    all_ids = {r[0] for r in corpus_rows}
    assert flagged_bc == all_ids - got_bc
    flagged_lsh = {
        r["vec_id"]
        for r in P.semantic_contaminated_ids(
            corpus, bench, threshold=0.95, broadcast_benchmark=False,
            n_planes=6, n_tables=8, dim=16,
        ).collect()
    }
    assert flagged_lsh == all_ids - got_lsh


def test_corpus_profile_exact_counts(spark):
    """r12 datasheet: exact cardinalities, degenerate-text counts, dup
    pressure via the exact_dedup content key, token/char totals, and
    the per-language breakdown."""
    rows = [
        (1, "alpha beta", "en"),
        (2, "alpha beta", "en"),       # exact dup of 1
        (3, "gamma delta epsilon", "en"),
        (4, None, "de"),
        (5, "   ", "de"),
        (6, "uno dos", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    profile, by_lang = P.corpus_profile(df, "doc_id", "text", lang_col="lang")
    p = profile.collect()[0]
    assert p["n_rows"] == 6 and p["n_ids"] == 6
    assert p["n_null_text"] == 1 and p["n_blank_text"] == 1
    # distinct texts: "alpha beta", "gamma...", "   ", "uno dos" = 4
    assert p["n_distinct_texts"] == 4
    assert p["total_chars"] == 10 + 10 + 19 + 0 + 3 + 7
    assert p["total_tokens"] == 2 + 2 + 3 + 0 + 0 + 2
    bl = {r["lang"]: r for r in by_lang.collect()}
    assert bl["en"]["n_rows"] == 3 and bl["en"]["n_distinct_texts"] == 2
    assert bl["en"]["total_tokens"] == 7
    assert bl["de"]["n_rows"] == 2 and bl["es"]["total_tokens"] == 2
