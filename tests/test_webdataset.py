"""WebDataset tar-shard export/ingest (sources/webdataset.py)."""

import tarfile

import pyspark.sql.functions as F

from gcf_corima_parquet_converter_spark import catalog
from gcf_corima_parquet_converter_spark.sources import webdataset as W


def _corpus(spark, sf_dir, n=60):
    # text + a deterministic binary payload per doc (fake image bytes)
    return (
        catalog.load(spark, sf_dir, "documents")
        .limit(n)
        .select(
            "doc_id",
            "text",
            "lang",
            F.sha2(F.col("doc_id").cast("string"), 256)
            .cast("binary")
            .alias("payload"),
        )
    )


def test_webdataset_roundtrip(spark, sf_dir, tmp_path):
    docs = _corpus(spark, sf_dir)
    out = str(tmp_path / "wds")
    manifest = W.write_webdataset(
        docs, out, "doc_id", {"txt": "text", "cls": "lang", "bin": "payload"},
        n_shards=4,
    )
    assert [m["shard"] for m in manifest] == [0, 1, 2, 3]
    assert sum(m["n_samples"] for m in manifest) == 60
    assert len(W.webdataset_shards(out)) == 4

    back = W.read_webdataset(
        spark, out, ["txt", "cls", "bin"], binary_exts={"bin"}
    )
    rows = {r["key"]: r for r in back.collect()}
    orig = {str(r["doc_id"]): r for r in docs.collect()}
    assert rows.keys() == orig.keys()
    for k, r in rows.items():
        assert r["txt"] == orig[k]["text"]
        assert r["cls"] == orig[k]["lang"]
        assert bytes(r["bin"]) == bytes(orig[k]["payload"])


def test_webdataset_sample_members_are_adjacent(spark, sf_dir, tmp_path):
    """WebDataset loaders group a sample by ADJACENCY in the tar — all
    of a key's members must be contiguous."""
    docs = _corpus(spark, sf_dir, n=30)
    out = str(tmp_path / "wds")
    W.write_webdataset(docs, out, "doc_id", {"txt": "text", "cls": "lang"},
                       n_shards=2)
    for shard in W.webdataset_shards(out):
        with tarfile.open(shard) as tar:
            stems = [m.name.rpartition(".")[0] for m in tar.getmembers()]
        seen = set()
        prev = None
        for s in stems:
            if s != prev:
                assert s not in seen, f"sample {s} split in {shard}"
                seen.add(s)
                prev = s


def test_webdataset_deterministic_and_seed_redeal(spark, sf_dir, tmp_path):
    docs = _corpus(spark, sf_dir, n=40)
    a, b, c = (str(tmp_path / d) for d in ("a", "b", "c"))
    W.write_webdataset(docs, a, "doc_id", {"txt": "text"}, n_shards=3)
    W.write_webdataset(docs.repartition(7), b, "doc_id", {"txt": "text"},
                       n_shards=3)
    W.write_webdataset(docs, c, "doc_id", {"txt": "text"}, n_shards=3,
                       seed="v2")

    def order(d):
        out = []
        for shard in W.webdataset_shards(d):
            with tarfile.open(shard) as tar:
                out.append(tuple(m.name for m in tar.getmembers()))
        return tuple(out)

    # same seed -> byte-identical layout regardless of input partitioning
    assert order(a) == order(b)
    # new seed -> a genuinely different deal
    assert order(a) != order(c)


def test_webdataset_null_text_roundtrips_empty(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    out = str(tmp_path / "wds")
    W.write_webdataset(df, out, "doc_id", {"txt": "text"}, n_shards=1)
    rows = {r["key"]: r["txt"] for r in
            W.read_webdataset(spark, out, ["txt"]).collect()}
    assert rows == {"1": "", "2": "x"}


def test_webdataset_rerun_with_fewer_shards_removes_stale(spark, sf_dir, tmp_path):
    docs = _corpus(spark, sf_dir, n=30)
    out = str(tmp_path / "wds")
    W.write_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=6)
    assert len(W.webdataset_shards(out)) == 6
    W.write_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=2)
    assert len(W.webdataset_shards(out)) == 2  # no orphan shard-0000[2-5]
    assert W.read_webdataset(spark, out, ["txt"]).count() == 30


def test_webdataset_failed_rerun_preserves_old_shards(spark, sf_dir, tmp_path):
    """Crash-safety ordering: a write that fails mid-job must leave the
    previous run's shards intact (new shards land by atomic rename,
    old ones are only deleted after success) and must NOT leave a
    valid-looking manifest.json pointing at a half-updated directory."""
    import os

    import pytest

    docs = _corpus(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    W.write_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=3)
    before = {s: os.path.getsize(s) for s in W.webdataset_shards(out)}
    assert len(before) == 3

    with pytest.raises(Exception):
        # the analysis error fires after the manifest-removal step,
        # standing in for any mid-job failure
        W.write_webdataset(docs, out, "doc_id", {"txt": "no_such_col"},
                           n_shards=3)
    after = {s: os.path.getsize(s) for s in W.webdataset_shards(out)}
    assert after == before  # every old shard survived, byte-identical size
    assert not os.path.exists(os.path.join(out, "manifest.json"))

    # a successful re-run restores the manifest and sweeps stale staging
    # files left by dead attempts
    open(os.path.join(out, "shard-00000.tar.999._tmp"), "wb").close()
    W.write_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=3)
    assert os.path.exists(os.path.join(out, "manifest.json"))
    assert not [f for f in os.listdir(out) if f.endswith("_tmp")]
    assert W.read_webdataset(spark, out, ["txt"]).count() == 20


def test_webdataset_manifest_persisted(spark, sf_dir, tmp_path):
    import json
    import os

    docs = _corpus(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    rows = W.write_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=2)
    with open(os.path.join(out, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["n_shards"] == 2 and m["files"] == {"txt": "text"}
    assert m["shards"] == rows
    assert sum(s["n_samples"] for s in m["shards"]) == 20


def test_webdataset_read_is_manifest_scoped(spark, sf_dir, tmp_path):
    """The reader consumes EXACTLY the manifest's shard list: an orphan
    tar (e.g. left by a larger older run on a foreign tool) is
    invisible, a listed-but-missing shard raises, and a manifest-less
    directory is readable only via an explicit glob-fallback warning
    (r6 advice: a crashed write must never be silently ingested)."""
    import json
    import os
    import shutil
    import warnings

    import pytest

    docs = _corpus(spark, sf_dir, n=20)
    out = str(tmp_path / "wds")
    rows = W.write_webdataset(docs, out, "doc_id", {"txt": "text"}, n_shards=2)
    shard0_n = next(d["n_samples"] for d in rows if d["shard"] == 0)

    # orphan shard outside the manifest: ignored by the scoped read
    shutil.copy(
        os.path.join(out, "shard-00000.tar"),
        os.path.join(out, "shard-00099.tar"),
    )
    assert W.read_webdataset(spark, out, ["txt"]).count() == 20

    # a listed shard going missing is loud, not a silent shrink
    os.rename(
        os.path.join(out, "shard-00001.tar"),
        os.path.join(out, "shard-00001.tar.held"),
    )
    with pytest.raises(FileNotFoundError, match="missing shard"):
        W.read_webdataset(spark, out, ["txt"])
    os.rename(
        os.path.join(out, "shard-00001.tar.held"),
        os.path.join(out, "shard-00001.tar"),
    )

    # manifest-less (what a crashed write leaves): warn + glob fallback,
    # or an error under require_manifest=True
    os.remove(os.path.join(out, "manifest.json"))
    with pytest.raises(FileNotFoundError, match="manifest"):
        W.read_webdataset(spark, out, ["txt"], require_manifest=True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n = W.read_webdataset(spark, out, ["txt"]).count()
    # glob mode sees the orphan too — exactly why it warns
    assert n == 20 + shard0_n
    assert any("manifest" in str(w.message) for w in caught)
