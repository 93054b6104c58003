"""WebDataset tar-shard export/ingest (LLM multimodal training format;
no reference twin).

WebDataset (github.com/webdataset/webdataset) stores a training corpus
as numbered ``.tar`` shards; each sample is a run of adjacent tar
members sharing a key stem — ``000123.jpg`` + ``000123.txt`` +
``000123.json`` is one sample.  Loaders stream shards sequentially, so
the shard is BOTH the unit of parallelism and the unit of sequential
I/O; what matters at scale is deterministic shard assignment (resumable,
re-runnable) and bounded shard size (no straggler shards).

* ``write_webdataset`` rides :func:`..operators.pipeline.shuffle_shards`
  for the md5-deterministic global shuffle + assignment (same seed ->
  byte-identical shards on any cluster size), then writes each shard as
  one tar via a per-group Arrow batch — one writer task per shard, no
  coordination.  Tars are staged under a ``_tmp`` name and renamed into
  place so a killed job never leaves a half-written shard with a live
  name (object-store note: rename is per-shard, not transactional
  across shards; re-running overwrites deterministically).
* ``read_webdataset`` scans ``*.tar`` with the binaryFile source — one
  task per shard, WebDataset's own parallelism model — and unpacks
  members with the stdlib ``tarfile`` inside ``mapInPandas`` (Arrow-
  batched; the only Python in the path, unavoidable since Spark has no
  tar codec).

The executor-side ``open()`` requires ``path`` to be a POSIX-visible
filesystem (local, NFS, FUSE-mounted object store) — the standard
WebDataset deployment; for raw ``gs://``/``s3://`` targets write
locally and distcp, or mount.
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.pipeline import shuffle_shards


def _to_bytes(val) -> bytes:
    if val is None:
        return b""
    if isinstance(val, (bytes, bytearray)):
        return bytes(val)
    return str(val).encode("utf-8")


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    files: dict[str, str],
    n_shards: int,
    seed: str = "",
) -> list[dict]:
    """Export ``df`` as ``path/shard-%05d.tar`` WebDataset shards.

    ``files`` maps tar member extension -> source column: binary columns
    are written raw, everything else utf-8 text (``{"txt": "text",
    "cls": "label"}`` gives members ``<key>.txt`` + ``<key>.cls``).
    Samples land in md5-shuffled order (trainer-ready — no source-order
    correlation), contiguous per key.  Returns the shard manifest
    (shard, n_samples, tar_bytes) and also writes it atomically to
    ``path/manifest.json`` — the loader's index and the re-run's
    verification artifact.

    One task per shard; memory is bounded by the largest single shard
    (size shards so samples*bytes fits an executor — the same knob as
    any WebDataset writer).  ``key_col`` values must be unique — two
    rows with one key would emit colliding member names inside a shard.

    Re-runs overwrite deterministically.  Crash-safety ordering: the
    previous ``manifest.json`` is removed FIRST (a half-updated
    directory is never paired with a valid-looking index), existing
    shards are left in place until the write job has succeeded (each
    new shard lands by atomic rename, so a killed job preserves every
    old shard it didn't finish replacing), and only then are stale
    shards — indexes not produced by this run, e.g. after an
    ``n_shards`` shrink or an empty shard group — deleted and the new
    manifest written.  :func:`read_webdataset` enforces the contract
    from the consumer side: with a manifest it reads exactly the listed
    shards (orphans invisible, missing shards loud), and a
    manifest-less directory — which is what a crashed write leaves —
    is flagged as unverifiable instead of silently ingested.
    """
    os.makedirs(path, exist_ok=True)
    manifest_path = os.path.join(path, "manifest.json")
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    cols = [key_col, *files.values()]
    sharded = shuffle_shards(
        df.select(*cols), n_shards, key_col, seed=seed, keep_order_col=True
    )
    exts = dict(files)  # capture for the closure

    def _write(pdfs):
        # concat the partition's Arrow batches first: a shard lives
        # entirely in one partition (hash on shard), but may span
        # batches — writing per batch would truncate it to the last one
        batches = list(pdfs)
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        # Stage under an attempt-unique name: with speculative execution
        # or a zombie retry, two attempts of one shard must not share a
        # tmp file, or os.replace could promote an interleaved tar.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        for shard, grp in pdf.groupby("shard", sort=True):
            grp = grp.sort_values(["_shuffle_order", key_col])
            final = os.path.join(path, f"shard-{int(shard):05d}.tar")
            tmp = f"{final}.{attempt}._tmp"
            with tarfile.open(tmp, "w") as tar:
                for row in grp.to_dict("records"):
                    key = str(row[key_col])
                    for ext, col in exts.items():
                        blob = _to_bytes(row[col])
                        info = tarfile.TarInfo(f"{key}.{ext}")
                        info.size = len(blob)
                        tar.addfile(info, io.BytesIO(blob))
            os.replace(tmp, final)
            yield pd.DataFrame(
                {
                    "shard": [int(shard)],
                    "n_samples": [len(grp)],
                    "tar_bytes": [os.path.getsize(final)],
                }
            )

    manifest = sharded.mapInPandas(
        _write, "shard int, n_samples long, tar_bytes long"
    ).collect()
    rows = sorted((r.asDict() for r in manifest), key=lambda d: d["shard"])
    # The job succeeded: now drop shards this run did not produce
    # (n_shards shrink, empty shard groups) plus any orphaned staging
    # files from failed attempts, THEN publish the manifest.
    produced = {os.path.join(path, f"shard-{d['shard']:05d}.tar") for d in rows}
    for f in glob.glob(os.path.join(path, "shard-*.tar")):
        if f not in produced:
            os.remove(f)
    for f in glob.glob(os.path.join(path, "shard-*.tar.*_tmp")):
        os.remove(f)
    # persist the loader's index atomically next to the shards
    tmp = os.path.join(path, "manifest.json._tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {"n_shards": n_shards, "seed": seed, "files": dict(files),
             "shards": rows},
            fh,
            indent=1,
        )
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return rows


def read_webdataset(
    spark: SparkSession,
    path: str,
    exts: list[str],
    binary_exts: set[str] | frozenset[str] = frozenset(),
    require_manifest: bool = False,
) -> DataFrame:
    """Scan WebDataset shards back to (key, shard, <ext columns>).

    One input task per tar (binaryFile source; shards are the split
    unit — tars are not splittable, which is why shard size is bounded
    at write time).  Members with extensions outside ``exts`` are
    skipped; ``binary_exts`` stay ``binary`` columns, the rest decode
    utf-8 to ``string``.

    Consistency contract: when ``path/manifest.json`` exists (the
    atomically-published index ``write_webdataset`` emits LAST), the
    read is scoped to EXACTLY the manifest's shard list — orphan tars
    from an older, larger run are ignored, and a listed-but-missing
    shard raises instead of silently shrinking the corpus.  Without a
    manifest (a foreign dataset, or a write that crashed before
    publishing — the writer removes the old manifest first), the read
    falls back to a ``shard-*.tar`` glob and WARNS that a partial or
    mixed shard set cannot be detected; pass ``require_manifest=True``
    to make that case an error.
    """
    manifest_path = os.path.join(path, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            man = json.load(fh)
        load_paths = [
            os.path.join(path, f"shard-{int(d['shard']):05d}.tar")
            for d in man["shards"]
        ]
        missing = [f for f in load_paths if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"webdataset at {path!r} is inconsistent: manifest lists "
                f"{len(missing)} missing shard(s), e.g. {missing[0]!r}"
            )
    elif require_manifest:
        raise FileNotFoundError(
            f"no manifest.json under {path!r} (require_manifest=True); "
            "the dataset may be a crashed/partial write"
        )
    else:
        import warnings

        warnings.warn(
            f"no manifest.json under {path!r}; falling back to a "
            "shard-*.tar glob — a crashed or partially-updated write "
            "cannot be detected in this mode",
            stacklevel=2,
        )
        load_paths = [os.path.join(path, "shard-*.tar")]
    fields = ", ".join(
        f"`{e}` {'binary' if e in binary_exts else 'string'}" for e in exts
    )
    schema = f"key string, shard string, {fields}"

    def _read(pdfs):
        for pdf in pdfs:
            out: dict[str, list] = {c: [] for c in ["key", "shard", *exts]}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
                    for m in tar.getmembers():
                        stem, dot, ext = m.name.rpartition(".")
                        if not dot or ext not in exts:
                            continue
                        samples.setdefault(stem, {})[ext] = tar.extractfile(
                            m
                        ).read()
                shard = os.path.basename(fpath)
                for key in sorted(samples):
                    out["key"].append(key)
                    out["shard"].append(shard)
                    for e in exts:
                        raw = samples[key].get(e)
                        if raw is None:
                            out[e].append(None)
                        elif e in binary_exts:
                            out[e].append(raw)
                        else:
                            out[e].append(raw.decode("utf-8"))
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(load_paths)
        .select("path", "content")
        .mapInPandas(_read, schema)
    )


def webdataset_shards(path: str) -> list[str]:
    """The shard files currently present (loader-side helper)."""
    return sorted(glob.glob(os.path.join(path, "shard-*.tar")))
