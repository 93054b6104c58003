"""n-gram LM with stupid backoff (operators/text.py: ngram_lm_train /
ngram_lm_score) — pinned against a pure-Python reference model
(Brants et al. 2007 scoring scheme; CCNet-style per-doc quality
score), plus the plan contracts (pure JVM, no forced broadcast of the
vocabulary-sized model)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gcf_corima_parquet_converter_spark.operators import text as X

SEP = "\x1f"
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox sleeps"),
    (3, "quick brown quick brown quick brown"),
    (4, "an entirely different sentence here"),
    (5, "the quick brown fox jumps again and again"),
    (6, None),
    (7, "   "),
    (8, "single"),
]


def _py_tokens(t):
    return [x for x in t.strip().split() if x] if t and t.strip() else []


def _py_padded(t, n):
    return ["<s>"] * (n - 1) + _py_tokens(t) + ["</s>"]


def _py_train(docs, n):
    counts = Counter()
    for _, t in docs:
        if not _py_tokens(t or ""):
            continue
        pt = _py_padded(t, n)
        for k in range(1, n + 1):
            for i in range(len(pt) - k + 1):
                counts[(k, SEP.join(pt[i:i + k]))] += 1
    return counts


def _py_score(t, model, n, alpha=0.4, scale=None):
    pt = _py_padded(t, n)
    big_n = sum(c for (k, _), c in model.items() if k == 1)
    toks = []
    for p in range(n - 1, len(pt) - 1):  # real tokens (0-based here)
        s = model.get((1, pt[p]), 0) / big_n
        for k in range(2, n + 1):
            g = model.get((k, SEP.join(pt[p - k + 1:p + 1])))
            c = model.get((k - 1, SEP.join(pt[p - k + 1:p])))
            if g is not None and c is not None:
                s = g / c
            else:
                s = alpha * s
        toks.append(s)
    if scale:
        return sum(math.floor(x * scale + 0.5) for x in toks) / scale / len(toks)
    return toks


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model3(docs_df):
    return X.ngram_lm_train(docs_df, n=3, id_col="doc_id").cache()


def test_train_matches_python_counts(docs_df, model3):
    got = {(r["order"], r["gram"]): r["cnt"] for r in model3.collect()}
    want = dict(_py_train(DOCS, 3))
    assert got == want
    # BOS/EOS padding is in the counts: '<s> <s>' backs the doc-start
    # trigram, EOS ends every doc exactly once
    live = [d for d in DOCS if _py_tokens(d[1] or "")]
    assert got[(2, SEP.join(["<s>", "<s>"]))] == len(live)
    assert got[(1, "</s>")] == len(live)
    # min_count prunes but can never orphan a surviving gram's context
    pruned = {
        (r["order"], r["gram"]): r["cnt"]
        for r in X.ngram_lm_train(docs_df, n=3, min_count=2).collect()
    }
    assert pruned == {k: v for k, v in want.items() if v >= 2}
    for (k, gram), _ in pruned.items():
        if k > 1:
            ctx = SEP.join(gram.split(SEP)[:-1])
            assert (k - 1, ctx) in pruned


def test_score_matches_python_model(docs_df, model3):
    got = {
        r["doc_id"]: (r["n_tokens"], r["lm_score"])
        for r in X.ngram_lm_score(
            docs_df, model3, n=3, scale=10**6
        ).collect()
    }
    want = {}
    model = _py_train(DOCS, 3)
    for did, t in DOCS:
        toks = _py_tokens(t or "")
        if not toks:
            continue
        want[did] = (len(toks), _py_score(t, model, 3, scale=10**6))
    assert got == want
    # (self-trained, a doc's own n-grams exist by construction — the
    # discriminative ordering is pinned in reference-model mode below)
    # OOV-only scoring: a doc of unseen tokens backs off to ~0
    oov = docs_df.sparkSession.createDataFrame(
        [(99, "zz yy xx")], "doc_id long, text string"
    )
    row = X.ngram_lm_score(oov, model3, n=3, scale=10**6).first()
    assert row["lm_score"] == 0.0 and row["n_tokens"] == 3


def test_score_bigram_and_unigram_orders(docs_df):
    for n in (1, 2):
        m = X.ngram_lm_train(docs_df, n=n)
        got = {
            r["doc_id"]: r["lm_score"]
            for r in X.ngram_lm_score(
                docs_df, m, n=n, scale=10**6
            ).collect()
        }
        model = _py_train(DOCS, n)
        for did, t in DOCS:
            if _py_tokens(t or ""):
                assert got[did] == _py_score(t, model, n, scale=10**6), (n, did)


def test_log_mode_and_reference_model(docs_df, model3, spark):
    # log mode: mean ln(S), OOV floored finite
    rows = X.ngram_lm_score(docs_df, model3, n=3, log=True).collect()
    model = _py_train(DOCS, 3)
    for r in rows:
        t = dict(DOCS)[r["doc_id"]]
        want = sum(
            math.log(max(s, 1e-12)) for s in _py_score(t, model, 3)
        ) / r["n_tokens"]
        assert r["lm_score"] == pytest.approx(want, rel=1e-12)
    # the production pattern: train on trusted docs, score a candidate
    trusted = spark.createDataFrame(
        [d for d in DOCS if d[0] <= 3], "doc_id long, text string"
    )
    m_ref = X.ngram_lm_train(trusted, n=3)
    cand = spark.createDataFrame(
        [(10, "the quick brown fox"), (11, "entirely novel junk tokens")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lm_score"]
        for r in X.ngram_lm_score(cand, m_ref, n=3, scale=10**6).collect()
    }
    assert got[10] > got[11]


def test_lm_plans_stay_jvm_and_model_join_not_forced_broadcast(
    docs_df, model3, spark
):
    for frame in (
        X.ngram_lm_train(docs_df, n=3),
        X.ngram_lm_score(docs_df, model3, n=3),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas",
                       "CartesianProduct"):
            assert marker not in plan
    # the model join must not pin a broadcast (a web-scale count table
    # is GBs): too-big regime -> shuffle join; only the one-row totals
    # frame may broadcast (collocations/snippets regime)
    conf = spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.enabled", "false")
        plan = (
            X.ngram_lm_score(docs_df, model3, n=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert "BroadcastHashJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 1
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the totals row


def test_bad_n_raises(docs_df, model3):
    with pytest.raises(ValueError, match="n must be"):
        X.ngram_lm_train(docs_df, n=0)
    with pytest.raises(ValueError, match="n must be"):
        X.ngram_lm_score(docs_df, model3, n=0)


# ------------------------------------------------- LM model lifecycle


def _model_dict(df):
    return {(r["order"], r["gram"]): r["cnt"] for r in df.collect()}


def test_ngram_lm_merge_shards_equals_one_pass_model(spark):
    """Per-shard models merged with ngram_lm_merge are BIT-identical
    to training once over the whole corpus (integer-sum exactness),
    and min_count applied after merging equals one-pass min_count."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    shards = [
        X.ngram_lm_train(docs.where(F.col("doc_id") % 3 == i), n=3)
        for i in range(3)
    ]
    merged = X.ngram_lm_merge(shards[0].unionByName(shards[1]).unionByName(shards[2]))
    assert _model_dict(merged) == _model_dict(X.ngram_lm_train(docs, n=3))
    pruned = X.ngram_lm_merge(
        shards[0].unionByName(shards[1]).unionByName(shards[2])
    ).where(F.col("cnt") >= 2)
    assert _model_dict(pruned) == _model_dict(
        X.ngram_lm_train(docs, n=3, min_count=2)
    )


def test_streaming_lm_maintain_load_compact(spark, tmp_path):
    """The LM rides the sketch-shard lifecycle: a real StreamingQuery
    lands per-batch count shards via maintain_sketch_shards, the
    loaded+merged model equals the batch-trained one exactly, and a
    mid-life compact_ngram_lm folds the epochs without changing a
    single count (scoring through either model is identical)."""
    import glob as _g
    import os
    import shutil

    from gcf_corima_parquet_converter_spark.streaming.ingest import (
        maintain_sketch_shards,
    )

    sch = "doc_id long, text string"
    src = str(tmp_path / "doc_src")
    os.makedirs(src)
    for name, part in (("f1", DOCS[:4]), ("f2", DOCS[4:])):
        p = str(tmp_path / name)
        spark.createDataFrame(part, sch).coalesce(1).write.parquet(p)
        [f] = _g.glob(os.path.join(p, "part-*.parquet"))
        shutil.copy(f, os.path.join(src, name + ".parquet"))

    root = str(tmp_path / "lm_artifact")
    q = maintain_sketch_shards(
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        lambda df: X.ngram_lm_train(df, n=3),
        root,
        checkpoint=str(tmp_path / "ck_lm"),
    )
    q.awaitTermination(120)

    docs = spark.createDataFrame(DOCS, sch)
    batch_model = X.ngram_lm_train(docs, n=3)
    streamed = X.load_ngram_lm(spark, root)
    assert _model_dict(streamed) == _model_dict(batch_model)

    out = X.compact_ngram_lm(spark, root)
    assert out["epochs_folded"] >= 1
    compacted = X.load_ngram_lm(spark, root)
    assert _model_dict(compacted) == _model_dict(batch_model)
    # min_count applies at read time (the merge-safe point)
    assert _model_dict(X.load_ngram_lm(spark, root, min_count=2)) == (
        _model_dict(X.ngram_lm_train(docs, n=3, min_count=2))
    )
    # end-to-end: scoring through the compacted streamed model matches
    # the batch model exactly (fixed-point graded mode)
    a = X.ngram_lm_score(docs, compacted, n=3, scale=10**6)
    b = X.ngram_lm_score(docs, batch_model, n=3, scale=10**6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --------------------------------------------- per-group (per-language)

GDOCS = [
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "the quick brown fox sleeps"),
    (3, "de", "der schnelle braune fuchs springt"),
    (4, "de", "der schnelle braune fuchs schlaeft"),
    (5, "en", "the quick brown fox jumps again"),
    (6, "fr", "le renard brun rapide saute"),   # fr present in model
    (7, "xx", "tokens from an unmodeled group"),  # scored vs missing model
]


def test_grouped_lm_train_score_matches_per_group_python_model(spark):
    """group_cols=['lang'] trains one model per language in one pass
    and scores each doc against ITS language's model — counts and
    scores equal running the ungrouped pipeline per language
    partition.  A doc whose group has no model rows scores 0 (the OOV
    base case), not null."""
    df = spark.createDataFrame(GDOCS, "doc_id long, lang string, text string")
    train_docs = [d for d in GDOCS if d[1] != "xx"]
    model = X.ngram_lm_train(
        df.where(F.col("lang") != "xx"), n=3, group_cols=["lang"]
    )
    got_counts = {
        (r["lang"], r["order"], r["gram"]): r["cnt"] for r in model.collect()
    }
    want_counts = {}
    for lang in ("en", "de", "fr"):
        part = [(i, t) for i, lg, t in train_docs if lg == lang]
        for (o, g), c in _py_train(part, 3).items():
            want_counts[(lang, o, g)] = c
    assert got_counts == want_counts

    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["lm_score"])
        for r in X.ngram_lm_score(
            df, model, n=3, scale=10**6, group_cols=["lang"]
        ).collect()
    }
    want = {}
    for did, lang, t in GDOCS:
        toks = _py_tokens(t or "")
        if not toks:
            continue
        part = [(i, tt) for i, lg, tt in train_docs if lg == lang]
        pmodel = _py_train(part, 3)
        if not pmodel:
            want[did] = (lang, len(toks), 0.0)  # modelless group
        else:
            want[did] = (lang, len(toks), _py_score(t, pmodel, 3, scale=10**6))
    assert got == want
    assert got[7] == ("xx", 5, 0.0)  # the unmodeled group, 0 not null

    # cross-group isolation: an en doc scored against the grouped
    # model ignores de/fr counts — equals scoring against the en-only
    # ungrouped model
    en_only = X.ngram_lm_train(
        df.where(F.col("lang") == "en"), n=3
    )
    solo = {
        r["doc_id"]: r["lm_score"]
        for r in X.ngram_lm_score(
            df.where(F.col("lang") == "en"), en_only, n=3, scale=10**6
        ).collect()
    }
    for did, lang, _ in GDOCS:
        if lang == "en":
            assert got[did][2] == solo[did]


def test_grouped_lm_merge_and_compact_keep_groups(spark, tmp_path):
    """Grouped shard models merge per (group, order, gram) — and a
    grouped artifact compaction with group_cols preserves the
    per-group models bit-identically."""
    df = spark.createDataFrame(GDOCS, "doc_id long, lang string, text string")
    full = X.ngram_lm_train(df, n=2, group_cols=["lang"])
    shards = [
        X.ngram_lm_train(
            df.where(F.col("doc_id") % 2 == i), n=2, group_cols=["lang"]
        )
        for i in range(2)
    ]
    merged = X.ngram_lm_merge(
        shards[0].unionByName(shards[1]), group_cols=["lang"]
    )
    key = lambda r: (r["lang"], r["order"], r["gram"])
    assert {key(r): r["cnt"] for r in merged.collect()} == {
        key(r): r["cnt"] for r in full.collect()
    }

    from gcf_corima_parquet_converter_spark.operators.manifest import (
        write_epoch,
    )

    root = str(tmp_path / "glm")
    for e, sh in enumerate(shards):
        write_epoch(sh, root, e)
    loaded = X.load_ngram_lm(spark, root, group_cols=["lang"])
    assert {key(r): r["cnt"] for r in loaded.collect()} == {
        key(r): r["cnt"] for r in full.collect()
    }
    out = X.compact_ngram_lm(spark, root, group_cols=["lang"])
    assert out["epochs_folded"] >= 1
    compacted = X.load_ngram_lm(spark, root, group_cols=["lang"])
    assert {key(r): r["cnt"] for r in compacted.collect()} == {
        key(r): r["cnt"] for r in full.collect()
    }


def test_grouped_lm_null_group_trains_but_never_matches(spark):
    """A null group key forms its own model rows at train time (groupBy
    groups nulls) but can never be scored against: the score join uses
    standard null-rejecting equality, so a null-group document falls
    through every lookup to the OOV base case and scores 0.  Pinned as
    the documented semantics — callers who want null-group scoring
    must fill the group column first."""
    df = spark.createDataFrame(
        [(1, "en", "a b a b"), (2, None, "a b a b")],
        "doc_id long, lang string, text string",
    )
    model = X.ngram_lm_train(df, n=2, group_cols=["lang"])
    langs = {r["lang"] for r in model.select("lang").distinct().collect()}
    assert langs == {"en", None}  # the null group trains
    got = {
        r["doc_id"]: r["lm_score"]
        for r in X.ngram_lm_score(
            df, model, n=2, scale=10**6, group_cols=["lang"]
        ).collect()
    }
    assert got[2] == 0.0   # null group never matches its own rows
    assert got[1] > 0.0


def test_salted_score_bit_identical_to_unsalted(docs_df, model3, spark):
    """Hot-gram salting (the stopword-skew fix, r15 verdict #4) must
    change ONLY the join partitioning: for every S and hot threshold
    the salted scores equal the unsalted ones bit-for-bit — including
    an OOV-bearing doc (unmatched in every salt bucket) — and the
    salted plan actually carries the salt in the join key while the
    output schema stays clean."""
    base = {
        r["doc_id"]: (r["n_tokens"], r["lm_score"])
        for r in X.ngram_lm_score(docs_df, model3, n=3, scale=10**6).collect()
    }
    # salt_hot_frac=0.01 on this tiny corpus makes most grams hot —
    # the salted path is exercised hard, not vacuously
    for s, frac in ((2, 0.01), (8, 0.01), (8, 0.5), (16, 0.001)):
        salted = X.ngram_lm_score(
            docs_df, model3, n=3, scale=10**6, salt=s, salt_hot_frac=frac
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["lm_score"])
            for r in salted.collect()
        }
        assert got == base, (s, frac)
        assert set(salted.columns) == {"doc_id", "n_tokens", "lm_score"}
    # salt=None / salt<=1 is the unchanged plan
    for s in (None, 0, 1):
        got = {
            r["doc_id"]: (r["n_tokens"], r["lm_score"])
            for r in X.ngram_lm_score(
                docs_df, model3, n=3, scale=10**6, salt=s
            ).collect()
        }
        assert got == base
    # OOV doc: unmatched through every bucket, same 0-chain either way
    oov = spark.createDataFrame(
        [(99, "zz yy xx ww vv")], "doc_id long, text string"
    )
    a = X.ngram_lm_score(oov, model3, n=3, scale=10**6).first()
    b = X.ngram_lm_score(oov, model3, n=3, scale=10**6, salt=8).first()
    assert (a["n_tokens"], a["lm_score"]) == (b["n_tokens"], b["lm_score"])
    # the salted plan joins on the salt column; the unsalted one doesn't
    salted_plan = X.ngram_lm_score(
        docs_df, model3, n=3, salt=8, salt_hot_frac=0.01
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in salted_plan
    unsalted_plan = X.ngram_lm_score(
        docs_df, model3, n=3
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in unsalted_plan


def test_salted_score_grouped_mode_bit_identical(spark):
    """Salting composes with per-group models: the hot set is
    per-group (each group's own count mass), a modelless group still
    scores 0, and a null group key still never matches — all equal to
    the unsalted grouped run."""
    df = spark.createDataFrame(GDOCS, "doc_id long, lang string, text string")
    model = X.ngram_lm_train(
        df.where(F.col("lang") != "xx"), n=3, group_cols=["lang"]
    )
    base = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["lm_score"])
        for r in X.ngram_lm_score(
            df, model, n=3, scale=10**6, group_cols=["lang"]
        ).collect()
    }
    for s, frac in ((4, 0.01), (8, 0.2)):
        got = {
            r["doc_id"]: (r["lang"], r["n_tokens"], r["lm_score"])
            for r in X.ngram_lm_score(
                df, model, n=3, scale=10**6, group_cols=["lang"],
                salt=s, salt_hot_frac=frac,
            ).collect()
        }
        assert got == base, (s, frac)
    # null group: trains rows, never matches, salted or not
    ndf = spark.createDataFrame(
        [(1, "en", "a b a b"), (2, None, "a b a b")],
        "doc_id long, lang string, text string",
    )
    nmodel = X.ngram_lm_train(ndf, n=2, group_cols=["lang"])
    got = {
        r["doc_id"]: r["lm_score"]
        for r in X.ngram_lm_score(
            ndf, nmodel, n=2, scale=10**6, group_cols=["lang"],
            salt=4, salt_hot_frac=0.01,
        ).collect()
    }
    assert got[2] == 0.0
    assert got[1] > 0.0
