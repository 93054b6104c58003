"""P8: null/degenerate-input behavior of the north-star operators.

The reference assumes dense well-formed data; a 100 TB documents corpus
does not — operators must neither crash nor silently fabricate matches
for null/empty/whitespace text.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from gcf_corima_parquet_converter_spark.operators import dedup as D
from gcf_corima_parquet_converter_spark.operators import text as X


def _docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            # 6/7: shorter than the shingle width — the ANSI element_at
            # out-of-bounds trap (must clamp, not throw)
            "text": ["a b c d e f", "a b c d e f", None, "", "   ", "solo", "two words"],
        }
    )
    return spark.createDataFrame(pdf)


def test_minhash_ignores_null_and_empty_docs(spark):
    pairs = D.minhash_dedup_pairs(_docs(spark), "doc_id", "text", k=8, bands=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2)}  # only the real duplicate pair; 3/4/5 never appear


def test_simhash_drops_tokenless_docs(spark):
    sig = D.simhash(_docs(spark), "doc_id", "text")
    ids = {r.doc_id for r in sig.collect()}
    assert ids == {1, 2, 6, 7}  # tokenless 3/4/5 dropped, short docs kept


def test_ngram_jaccard_null_safe(spark):
    pairs = D.ngram_jaccard_pairs(_docs(spark), "doc_id", "text", n=2, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_exact_dedup_keeps_null_text_rows(spark):
    # null text is CONTENT (a distinct group), not an error: concat_ws
    # treats null as empty, so null and "" collide — acceptable and
    # documented here; both must survive as one kept row.
    kept = D.exact_dedup(_docs(spark), ["text"], "doc_id")
    ids = sorted(r.doc_id for r in kept.collect())
    assert 1 in ids and 2 not in ids  # dup pair collapsed to lowest id
    assert len(ids) == 5  # (1), (null/"" group), ("   "), ("solo"), ("two words")


def test_quality_features_null_text(spark):
    out = X.quality_features(_docs(spark)).orderBy("doc_id").collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[3].n_tokens is None  # null propagates, no crash
    assert by_id[4].quality_keep is False
    assert bool(by_id[1].quality_keep) is False  # only 6 tokens, <20 chars


def test_line_dedup_null_and_empty_docs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["shared\nmine", "shared\nyours", None, ""],
            }
        )
    )
    out = {r["doc_id"]: r for r in D.line_dedup(df, "doc_id", "text", min_docs=2).collect()}
    assert out[1]["text"] == "mine" and out[2]["text"] == "yours"
    # null/empty docs pass through untouched, never throw
    assert out[3]["text"] is None
    assert out[4]["text"] == ""
    assert out[3]["n_dropped"] == 0 and out[4]["n_dropped"] == 0


def test_tfidf_topk_null_and_empty_docs(spark):
    from gcf_corima_parquet_converter_spark.operators.text import tfidf_topk

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["real words here", None, "  "]})
    )
    out = tfidf_topk(df, "doc_id", "text", k=3).collect()
    # null/blank docs yield no terms -> no rows; no exceptions
    assert {r["doc_id"] for r in out} == {1}


def test_weighted_sample_null_weight_drops_row(spark):
    from gcf_corima_parquet_converter_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "w": [10.0, None, 5.0]})
    )
    kept = weighted_sample(df, "id", "w", fraction=10.0).collect()
    assert all(r["id"] != 2 for r in kept)  # null weight -> never kept
    # fraction high enough that every weighted row clears the bar
    assert {r["id"] for r in kept} == {1, 3}


def test_unigram_logprob_null_docs(spark):
    from gcf_corima_parquet_converter_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", None]})
    )
    out = unigram_logprob(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in out} == {1}


def test_dedup_components_null_and_self_pairs(spark):
    """Null ids and self-pairs in the pair stream must not corrupt the
    labeling: null endpoints contribute no edges (SQL join semantics),
    self-pairs are no-ops."""
    from gcf_corima_parquet_converter_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (5, 5), (2, 6)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["comp"] for r in D.dedup_components(pairs).collect()}
    # {1,2,6} one component; null-partner pairs are dropped entirely
    # (no linkage information), so 3 and 4 never become nodes; the
    # 5-5 self-pair yields a singleton with its own label
    assert comp[1] == comp[2] == comp[6] == 1
    assert comp.get(5, 5) == 5
    assert 3 not in comp and 4 not in comp and None not in comp
    for k, v in comp.items():
        assert v is not None and v <= k


def test_dsir_and_compression_null_docs(spark):
    from gcf_corima_parquet_converter_spark.operators.text import (
        compression_ratio,
        dsir_logweight,
    )

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, None), (3, "")], ["doc_id", "text"]
    )
    target = spark.createDataFrame([("aa",)], ["text"])
    cr = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df, "doc_id", "text").collect()}
    assert cr[1] is not None and cr[2] is None and cr[3] is None
    # null/empty docs have no features -> absent from the weight table
    dw = {r["doc_id"] for r in dsir_logweight(df, "doc_id", "text", target).collect()}
    assert dw == {1}


def test_bloom_ngram_decontaminate_null_and_short_docs(spark):
    """Null/empty/short corpus text produces no grams, so such docs can
    never be contaminated (NOT EXISTS over an empty gram set is true) —
    they must SURVIVE, not crash the tokenizer or vanish."""
    from gcf_corima_parquet_converter_spark.operators import pipeline as P

    corpus = _docs(spark)
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["a b c d e f g"]})
    )
    kept = {
        r["doc_id"]
        for r in P.bloom_ngram_decontaminate(
            corpus, bench, "doc_id", "text", n=4
        ).collect()
    }
    # docs 1/2 share the 4-gram "a b c d" with the benchmark -> dropped;
    # null/empty/whitespace/short docs all survive
    assert kept == {3, 4, 5, 6, 7}
    # a null-text BENCHMARK contributes no grams and blocks nothing
    nb = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [None]})
    )
    assert P.bloom_ngram_decontaminate(
        corpus, nb, "doc_id", "text", n=4
    ).count() == 7


def test_embedding_near_dup_cap_with_null_vectors(spark):
    """Null embeddings must not break the capped LSH path (they carry
    no buckets and pair with nothing)."""
    import numpy as np

    rng = np.random.default_rng(1)
    rows = []
    v = rng.normal(size=8); v /= np.linalg.norm(v)
    for i in range(80):  # identical family
        rows.append((i, [float(x) for x in v]))
    rows.append((900, None))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = D.embedding_near_dup_pairs(
        emb, threshold=0.99, dim=8, max_bucket=20
    ).collect()
    ids = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    assert 900 not in ids and set(range(80)) <= ids


def test_contaminated_spans_null_empty_whitespace_docs(spark):
    """r12: the span-decontamination family on degenerate text.
    Null/empty/whitespace-only docs produce no token windows, so they
    can never carry a contaminated span — no rows in the span frame,
    and the strip rewrite passes them through UNTOUCHED (null stays
    null, '' stays '')."""
    from gcf_corima_parquet_converter_spark.operators import pipeline as P

    corpus = _docs(spark)
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["a b c d e f g h"]})
    )
    spans = P.contaminated_spans(corpus, bench, "doc_id", "text", width=4)
    span_ids = {r["doc_id"] for r in spans.collect()}
    assert span_ids == {1, 2}  # only the real overlap; 3/4/5/6/7 never appear

    stripped = P.strip_contaminated_spans(
        corpus, bench, "doc_id", "text", width=4
    )
    by_id = {r["doc_id"]: r["text"] for r in stripped.collect()}
    assert len(by_id) == 7  # every doc survives, none dropped
    assert by_id[3] is None and by_id[4] == "" and by_id[5] == "   "
    assert by_id[6] == "solo" and by_id[7] == "two words"
    assert by_id[1] == "" and by_id[2] == ""  # fully-contaminated: text gone, doc kept

    # a null/empty-text BENCHMARK contributes no windows and strips nothing
    nb = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100, 101], "text": [None, "  "]})
    )
    assert P.contaminated_spans(corpus, nb, "doc_id", "text", width=4).count() == 0
    untouched = {
        r["doc_id"]: r["text"]
        for r in P.strip_contaminated_spans(
            corpus, nb, "doc_id", "text", width=4
        ).collect()
    }
    assert untouched == {
        1: "a b c d e f", 2: "a b c d e f", 3: None, 4: "", 5: "   ",
        6: "solo", 7: "two words",
    }


def test_decontaminate_stream_null_empty_whitespace_docs(spark, tmp_path):
    """r12: the ingest-time gate lands null/empty/whitespace docs
    untouched — an empty gram set can never be contaminated."""
    import glob
    import os
    import shutil

    from gcf_corima_parquet_converter_spark.operators import manifest as M
    from gcf_corima_parquet_converter_spark.streaming.ingest import (
        decontaminate_stream,
    )

    sch = "doc_id long, text string"
    bench = spark.createDataFrame([(0, "a b c d e f g h")], sch)
    rows = [
        (1, "a b c d e f g h and more"),  # contaminated
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "clean words only here"),
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    stage = str(tmp_path / "stage")
    spark.createDataFrame(rows, sch).coalesce(1).write.parquet(stage)
    [f] = glob.glob(stage + "/part-*.parquet")
    shutil.copy(f, os.path.join(src, "a.parquet"))

    out_p = str(tmp_path / "clean")
    q = decontaminate_stream(
        spark.readStream.schema(sch).parquet(src),
        bench, "doc_id", "text", out_p, str(tmp_path / "ck"), n=8,
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["text"] for r in M.read_artifact(spark, out_p).collect()
    }
    assert got == {2: None, 3: "", 4: "   ", 5: "clean words only here"}


def test_retrieval_null_empty_whitespace_docs(spark):
    """r13 retrieval tier: null/empty/whitespace docs carry no postings,
    are excluded from n_docs/avgdl, and can never match a phrase or
    score in BM25; a corpus that is ALL degenerate yields empty results,
    not a crash (index_stats on an empty index returns n_docs=0)."""
    from gcf_corima_parquet_converter_spark.operators import retrieval as R

    d = _docs(spark)
    idx = R.inverted_index(d)
    assert {r.doc_id for r in idx.collect()} == {1, 2, 6, 7}
    stats = R.index_stats(idx).first()
    assert stats["n_docs"] == 4
    assert stats["avgdl"] == (6 + 6 + 1 + 2) / 4
    assert {
        r.doc_id for r in R.phrase_search(idx, "a b").collect()
    } == {1, 2}
    got = {r.doc_id for r in R.bm25_topk(idx, ["solo"], k=10).collect()}
    assert got == {6}
    # all-degenerate corpus
    allbad = d.where(F.col("doc_id").isin(3, 4, 5))
    empty_idx = R.inverted_index(allbad)
    assert empty_idx.count() == 0
    row = R.index_stats(empty_idx).first()
    assert row["n_docs"] == 0
    assert R.phrase_search(empty_idx, "a b").count() == 0
    assert R.bm25_topk(empty_idx, ["a"], k=3).count() == 0


def test_retrieval_eval_and_prf_null_robustness(spark):
    """r14 additions: retrieval_eval ignores null-rel / rel<1 / null-id
    judgment rows (the positive set filters them), and prf_expand skips
    null/blank-text feedback docs without disturbing the weights of the
    rest or crashing on an all-degenerate feedback set."""
    from gcf_corima_parquet_converter_spark.operators import retrieval as R

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "q_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 12, None), (1, None, 2), (1, 13, 0)],
        "q_id long, doc_id long, rel int",
    )
    row = R.retrieval_eval(res, qrels, k=10).first()
    # only (1, 10, rel=1) is a positive judgment
    assert row["n_rel"] == 1 and row["n_hits"] == 1
    assert row["recall"] == 1.0 and row["rr"] == 1.0
    assert row["ap"] == 1.0 and row["ndcg"] == 1.0
    # all judgments degenerate -> no evaluable queries, empty frame
    bad = qrels.where(F.col("rel").isNull() | (F.col("rel") < 1))
    assert R.retrieval_eval(res, bad, k=10).count() == 0

    docs = spark.createDataFrame(
        [(10, "a a b"), (11, None), (12, "   "), (13, "")],
        "doc_id long, text string",
    )
    ranking = spark.createDataFrame(
        [(10, 2.0), (11, 1.5), (12, 1.0), (13, 0.5)],
        "doc_id long, score double",
    )
    got = {
        r["term"]: r["weight"]
        for r in R.prf_expand(docs, ranking, n_terms=10).collect()
    }
    # only doc 10 contributes: a -> (2/3)*2.0, b -> (1/3)*2.0
    assert got == {"a": (2 / 3) * 2.0, "b": (1 / 3) * 2.0}
    # all-degenerate feedback set -> empty expansion, not a crash
    assert R.prf_expand(
        docs, ranking.where(F.col("doc_id") > 10), n_terms=5
    ).count() == 0


def test_proximity_and_lm_null_empty_whitespace_docs(spark):
    """r15 additions under the same P8 bar: degenerate docs carry no
    postings (proximity can never match them) and no LM rows (nothing
    to score, grouped or not); an all-degenerate corpus yields empty
    frames, not crashes."""
    from gcf_corima_parquet_converter_spark.operators import retrieval as R

    d = _docs(spark)
    idx = R.inverted_index(d)
    assert {
        r.doc_id for r in R.proximity_search(idx, "a c", slop=1).collect()
    } == {1, 2}
    empty_idx = R.inverted_index(d.where(F.col("doc_id").isin(3, 4, 5)))
    assert R.proximity_search(empty_idx, "a b", slop=3).count() == 0

    model = X.ngram_lm_train(d, n=2)
    scored = X.ngram_lm_score(d, model, n=2, scale=10**6)
    assert {r.doc_id for r in scored.collect()} == {1, 2, 6, 7}
    allbad = d.where(F.col("doc_id").isin(3, 4, 5))
    assert X.ngram_lm_train(allbad, n=2).count() == 0
    assert X.ngram_lm_score(
        allbad, model, n=2, scale=10**6
    ).count() == 0
    # grouped: null/blank text drops BEFORE grouping — a group whose
    # docs are all degenerate simply has no model and no scored rows
    g = d.withColumn(
        "grp", F.when(F.col("doc_id") <= 2, "a").otherwise("b")
    )
    gm = X.ngram_lm_train(g, n=2, group_cols=["grp"])
    assert {r["grp"] for r in gm.select("grp").distinct().collect()} == {
        "a", "b",
    }
    gs = X.ngram_lm_score(g, gm, n=2, scale=10**6, group_cols=["grp"])
    assert {r.doc_id for r in gs.collect()} == {1, 2, 6, 7}
