"""Archive-shard sources: WebDataset-style tar (and zip) sample shards.

Large multimodal training sets ship as directories of tar shards, each
holding samples as adjacent members that share a basename key::

    shard-00000.tar
      ├── 000001.png      ── one sample: image + caption + metadata
      ├── 000001.txt
      ├── 000001.json
      ├── 000002.png
      └── ...

(The WebDataset convention — Aizman et al., "High Performance I/O For
Large Scale Deep Learning"; the format is plain POSIX tar, readable
with stdlib ``tarfile``.)

Spark-first shape: ``binaryFile`` lists and reads WHOLE shards — one
row per shard, parallelism = shard count, which is exactly how the
format is meant to scale (shards are sized ~100 MB-1 GB so that
sequential whole-shard reads saturate object-store throughput; a 100 TB
set is ~10^5 shards = ample partitions for any cluster).  A
``mapInPandas`` kernel then explodes members per shard.  Two
consequences to respect at scale:

- a shard must fit in executor memory (it does, by the format's own
  sizing convention — that is WHY WebDataset shards are capped);
- member extraction is narrow (no shuffle); only the optional
  per-sample grouping shuffles, keyed on (shard, key), and AQE
  coalesces those tiny aggregates.

Reassembled samples join the multimodal kernels directly: the ``png``/
``gif``/``bmp``/``wav`` members decode for REAL via
operators/multimodal's stdlib codecs.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
import zipfile
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEMBERS_SCHEMA = "shard STRING, key STRING, ext STRING, content BINARY"

# binaryFile's fixed schema, spelled out because STREAMING sources
# require an explicit schema (no inference pass over the directory)
_BINARYFILE_SCHEMA = (
    "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"
)


def _split_member_name(name: str) -> tuple[str, str]:
    """WebDataset key/ext split: extension = everything after the FIRST
    dot of the basename (so ``000001.seg.png`` groups with
    ``000001.txt`` under key ``000001`` — the convention's rule for
    multi-dotted member names)."""
    base = posixpath.basename(name)
    dirname = posixpath.dirname(name)
    stem, dot, ext = base.partition(".")
    key = posixpath.join(dirname, stem) if dirname else stem
    return key, ext if dot else ""


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """(shard, key, ext, content) — every file member of every tar
    shard under ``path`` (a ``binaryFile`` path/glob, e.g.
    ``/data/shards/*.tar``)."""
    shards = spark.read.format("binaryFile").load(path)
    return _explode_members(shards, _tar_members)


def read_zip_shards(spark: SparkSession, path: str) -> DataFrame:
    """(shard, key, ext, content) — zip variant of
    :func:`read_tar_shards` (stdlib ``zipfile``)."""
    shards = spark.read.format("binaryFile").load(path)
    return _explode_members(shards, _zip_members)


def stream_tar_shards(
    spark: SparkSession, path: str, *, max_shards_per_trigger: int = 8
) -> DataFrame:
    """Streaming variant of :func:`read_tar_shards`: new shards landing
    under ``path`` become micro-batches of exploded members — the
    arrival pattern of a crawler or labeling pipeline dropping finished
    shards into object storage.

    The member explode (``mapInPandas``) is a narrow, stateless
    transformation, so it composes with any stateful downstream —
    e.g. caption streams into streaming/dedup.dedup_doc_stream or
    streaming/neardup.minhash_pairs_stream (test-pinned composition).
    ``max_shards_per_trigger`` bounds per-batch memory: batch size =
    that many whole shards.
    """
    shards = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_shards_per_trigger))
        .load(path)
    )
    # members carry ts = shard modificationTime (arrival event time) so
    # downstream watermarked/stateful stages work out of the box
    return _explode_members(shards, _tar_members, with_ts=True)


def _tar_members(blob: bytes) -> Iterator[tuple[str, bytes]]:
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for m in tf.getmembers():
            if m.isfile():
                f = tf.extractfile(m)
                if f is not None:
                    yield m.name, f.read()


def _zip_members(blob: bytes) -> Iterator[tuple[str, bytes]]:
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if not info.is_dir():
                yield info.filename, zf.read(info)


def _explode_members(shards: DataFrame, members_fn, *, with_ts: bool = False) -> DataFrame:
    """``with_ts`` carries each shard's modificationTime through as the
    member event-time column ``ts`` — the streaming path needs an event
    time for watermarks; batch readers keep the lean schema."""
    import pandas as pd

    cols = ["shard", "key", "ext", "content"] + (["ts"] if with_ts else [])

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, (path, blob) in enumerate(zip(pdf["path"], pdf["content"])):
                ts = pdf["modificationTime"].iloc[i] if with_ts else None
                # a shard may legally hold the same member name twice
                # (``tar -u`` keeps the superseded copy; zips can
                # repeat names): tar semantics say the LATER member
                # wins, so dedupe per (key, ext) in archive order —
                # without this, webdataset_samples' map_from_entries
                # would abort the whole job with DUPLICATED_MAP_KEY
                # on one such shard.
                last: dict[tuple, tuple] = {}
                for name, data in members_fn(bytes(blob)):
                    key, ext = _split_member_name(name)
                    last[(key, ext)] = (path, key, ext, bytearray(data))
                for row in last.values():
                    rows.append(row + (ts,) if with_ts else row)
            yield pd.DataFrame(rows, columns=cols)

    schema = MEMBERS_SCHEMA + (", ts TIMESTAMP" if with_ts else "")
    keep = ["path", "modificationTime", "content"] if with_ts else ["path", "content"]
    return shards.select(*keep).mapInPandas(kernel, schema=schema)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """(shard, key, parts MAP<STRING, BINARY>) — members reassembled
    into samples by basename key.  ``parts['png']`` is the image bytes,
    ``parts['txt']`` the caption, etc.  The only shuffle in the source
    path, keyed on (shard, key) — sample-sized groups, no skew by
    construction (keys are unique within a shard).

    Duplicate (key, ext) members never reach this group: the explode
    kernel already applies tar's later-member-wins rule per shard, so
    ``map_from_entries`` cannot hit DUPLICATED_MAP_KEY here."""
    return members.groupBy("shard", "key").agg(
        F.map_from_entries(F.collect_list(F.struct("ext", "content"))).alias("parts")
    )


def image_rows_from_samples(
    samples: DataFrame, *, ext: str = "png", id_from_key: bool = True
) -> DataFrame:
    """Project samples holding an ``ext`` image member into the
    multimodal IMAGE_SCHEMA, ready for image_features / image_phashes /
    resize_images.  ``media_id`` is the trailing integer of the key
    when ``id_from_key`` (the WebDataset numbering convention), else a
    dense hash of (shard, key).  A key WITHOUT trailing digits falls
    back to the hash id instead of going NULL — a single oddly-named
    member must not poison downstream kernels (they int() the id)."""
    img = F.element_at(F.col("parts"), ext)
    hash_id = F.abs(F.xxhash64("shard", "key"))
    # regexp_extract returns '' on no match, and a 20+-digit numeric
    # key overflows bigint — try_cast turns both into NULL (ANSI cast
    # would throw and kill the job on one oddly-named member), then
    # fall back to the hash id
    media_id = (
        F.coalesce(
            F.regexp_extract(F.col("key"), r"(\d+)$", 1).try_cast("bigint"),
            hash_id,
        )
        if id_from_key
        else hash_id
    )
    return (
        samples.where(img.isNotNull())
        .select(
            media_id.alias("media_id"),
            img.alias("content"),
            F.struct(
                F.lit(ext).alias("format"),
                F.lit(0).cast("int").alias("width"),
                F.lit(0).cast("int").alias("height"),
            ).alias("meta"),
        )
    )
