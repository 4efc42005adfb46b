"""Filesystem maintenance helpers routed through the Hadoop
FileSystem API.

Store-maintenance paths (IVFPQIndex append/compact, streaming-ingest
batch markers, the dedup band store) need directory listing / rename /
delete / tiny-file writes on the SAME storage the parquet data lives
on.  ``os.listdir`` / ``shutil`` only see the local filesystem — on a
real cluster the store is HDFS/S3A and those calls silently report
"nothing there", which turns idempotence guards into no-ops.  Routing
through ``Path.getFileSystem(hadoopConf)`` makes every helper work on
any scheme Spark itself can read (``file://``, ``hdfs://``, ``s3a://``)
with zero behavior change on local paths, because the local scheme is
just another Hadoop FileSystem.

These are DRIVER-side control-plane calls (a handful per batch/epoch),
so py4j round-trip cost is irrelevant; the data plane stays in
``DataFrame.write``.

One caveat worth stating where compaction relies on it: Hadoop
``rename`` on file:// and hdfs:// is atomic directory move; on S3A it
is a COPY (non-atomic, O(data)).  The compact/swap sequences below are
therefore crash-safe on posix/HDFS and best-effort on raw S3 — same
contract every Hadoop-based table format (Hive, pre-Iceberg) has.
"""

from __future__ import annotations


def _fs(spark, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def list_names(spark, path: str) -> list[str]:
    """Child basenames of ``path`` (files and directories); [] if the
    directory does not exist."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def delete(spark, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, True))


def rename(spark, src: str, dst: str) -> bool:
    """Hadoop rename (atomic move on posix/HDFS).  False if the source
    is missing or the destination already exists — callers that need
    clobber semantics delete the destination first, explicitly."""
    fs, s = _fs(spark, src)
    _, d = _fs(spark, dst)
    if not fs.exists(s):
        return False
    return bool(fs.rename(s, d))


def mkdirs(spark, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.mkdirs(p)


def write_text(spark, path: str, text: str) -> None:
    """Create/overwrite a small text file (batch markers).  Parent
    directories are created implicitly by ``FileSystem.create``."""
    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
