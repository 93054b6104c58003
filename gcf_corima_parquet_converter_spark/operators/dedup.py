"""Deduplication operators for LLM-data pipelines (north star).

Four families, all shuffle-aware and 100 TB-shaped:

* exact        — hash-groupBy on a content digest; one shuffle on the
                 digest, no data movement beyond the winning rows.
* ngram-jaccard— EXACT word-n-gram Jaccard via an inverted-index
                 self-join (explode shingles -> join on shingle ->
                 count common).  Never a cross join: cost is bounded by
                 shingle document frequency, and ultra-frequent shingles
                 can be capped (``max_df``) exactly like a search engine
                 drops stop-shingles.
* MinHash+LSH  — k min-hashes per doc computed as k aggregate
                 expressions in ONE groupBy pass (no k-fold row blowup),
                 banded into b buckets, candidate pairs from equi-joins
                 on (band, band_hash).  The scale path: candidates are
                 ~linear, verification re-checks exact Jaccard.
* SimHash      — 64-bit signature from token hashes via 64 sign-sums in
                 one aggregation; near-dup candidates join on 16-bit
                 chunks (Hamming<=3 guarantee by pigeonhole over 4
                 chunks).

Everything is built-in expressions (xxhash64, explode, groupBy) —
JVM-side, codegen'd, partially aggregable.  No Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .text import tokens

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct content (hash-groupBy dedup).

    The digest shuffle key keeps payloads local: only (digest, id) pairs
    move, then a semi-join pulls winning rows — at 100 TB the heavy text
    column crosses the wire zero times.
    """
    digest = F.md5(F.concat_ws("\x1f", *content_cols)).alias("_digest")
    winners = (
        df.select(digest, F.col(id_col))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


# --------------------------------------------------------------- shingles


def shingle_df(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) rows: distinct word n-grams per document."""
    toks = tokens(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join.

    Returns (id_a, id_b, n_common, n_a, n_b) with id_a < id_b and
    jaccard = n_common/(n_a+n_b-n_common) >= threshold.  ``max_df``
    drops shingles appearing in more than that many docs (bounds the
    self-join fan-out on skewed shingles; AQE skew-join splits the
    rest).
    """
    sh = shingle_df(df, id_col, text_col, n).cache()
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    uni = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("n_common") >= F.lit(float(threshold)) * uni)
        .select("id_a", "id_b", "n_common", "n_a", "n_b")
    )


# ---------------------------------------------------------------- minhash


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 32, n: int = 3
) -> DataFrame:
    """k-permutation MinHash signature per doc as ONE aggregation.

    Each "permutation" is xxhash64(shingle, seed_i); the signature row
    is k min() aggregates — partial aggregation collapses each partition
    to one row per doc before the shuffle (no k-fold row multiplication,
    unlike the naive explode-by-seed layout).
    """
    sh = shingle_df(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}") for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: equi-join docs whose signature agrees on ALL rows of
    some band.  Returns distinct (id_a, id_b) candidates, id_a < id_b."""
    k = bands * rows_per_band
    band_hashes = F.array(
        *[
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band", "bh")
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard (the standard
    two-phase near-dup: cheap recall phase, exact precision phase).

    The verify phase is restricted to the candidate pairs: candidates
    equi-join per-doc shingle sets and Jaccard is ``array_intersect`` per
    pair — O(candidates), never the all-pairs inverted-index join.  At
    100 TB the exact join over the corpus would dominate everything LSH
    saved; this keeps verification linear in LSH output size.
    """
    sh = shingle_df(df, id_col, text_col, n)
    sigs = sh.groupBy(id_col).agg(
        *[F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}") for i in range(k)]
    )
    cand = minhash_candidate_pairs(sigs, id_col, bands=bands, rows_per_band=k // bands)
    sets = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("_sh"))
    a = sets.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    n_common = F.size(F.array_intersect("_sh_a", "_sh_b"))
    n_a, n_b = F.size("_sh_a"), F.size("_sh_b")
    uni = n_a + n_b - n_common
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            n_common.alias("n_common"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
        .where(F.col("n_common") >= F.lit(float(threshold)) * (F.col("n_a") + F.col("n_b") - F.col("n_common")))
    )


# ---------------------------------------------------------------- simhash


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash signature: sign of per-bit weighted sums of token hashes.

    64 sign-sums as plain aggregate expressions — one shuffle keyed by
    doc, map-side combined.  Result column ``simhash`` is a signed i64
    bit pattern.
    """
    tok = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .where(F.length("tok") > 0)
        .withColumn("h", F.xxhash64("tok"))
    )
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s_{i}")
            for i in range(bits)
        ]
    )
    sig = sum(
        (
            F.when(F.col(f"s_{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(2**63))).otherwise(0)
            for i in range(bits)
        ),
        F.lit(0).cast("long"),
    )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidate_pairs(sig_df: DataFrame, id_col: str) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit chunk of the
    simhash (pigeonhole: catches all pairs with Hamming distance <= 3)."""
    chunks = F.array(
        *[
            F.shiftrightunsigned("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ]
    )
    e = sig_df.select(F.col(id_col), F.col("simhash"), F.posexplode(chunks).alias("chunk", "cv"))
    a = e.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "cv")
    b = e.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "cv")
    pairs = (
        a.join(b, ["chunk", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming)


# ----------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs.  With ``block_col`` the self-join is
    equi on the block (e.g. an LSH bucket from similarity.hyperplane_
    buckets or a coarse IVF centroid) — the scalable path.  Without it,
    a bounded brute-force cross join (testing / small partitions only).
    """
    from .similarity import dot  # local import to avoid cycle

    if block_col and dict(emb.dtypes)[block_col].startswith("array"):
        # multi-table LSH: explode (table, bucket) pairs; a pair is a
        # candidate if it collides in ANY table (distinct dedups the ORs)
        ex = emb.select(
            F.col(id_col),
            F.col(vec_col),
            F.posexplode(F.col(block_col)).alias("_tbl", "_bkt"),
        )
        a = ex.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_tbl", "_bkt"
        )
        b = ex.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_tbl", "_bkt"
        )
        cand = (
            a.join(b, ["_tbl", "_bkt"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "va", "vb")
            .distinct()
        )
    else:
        a = emb.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            *([F.col(block_col).alias("_blk")] if block_col else []),
        )
        b = emb.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            *([F.col(block_col).alias("_blk")] if block_col else []),
        )
        joined = a.join(b, ["_blk"]) if block_col else a.crossJoin(b)
        cand = joined.where(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn("cos_sim", dot(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ------------------------------------------------------------- keep-lists


def dedup_keep_first(pairs: DataFrame, df: DataFrame, id_col: str) -> DataFrame:
    """Resolve near-dup pairs into a keep-list: drop the higher id of
    every pair (union-find-free approximation standard in data pipelines;
    transitive chains collapse because every doc linked to any smaller
    id is dropped)."""
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")
