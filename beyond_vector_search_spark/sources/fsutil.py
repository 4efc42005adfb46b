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

Atomicity: store compaction (IVFPQIndex / KnnGraphIndex) does NOT use
rename at all — it commits through the versioned-directory helpers
below (``resolve_version`` / ``commit_version``), whose commit point
is a single marker-file CREATE.  Single-object create is atomic on
every store Spark runs against (posix, HDFS close-visibility, S3 PUT),
so compaction is crash-safe on S3A too, with no reliance on directory
rename.  ``rename`` itself is still exposed (atomic move on
posix/HDFS; a copy on S3A) for callers that know their scheme.

Versioned-directory protocol (the pointer-file commit): a store family
``{prefix}`` keeps its data in ``{path}/{prefix}-v{N}`` directories
and its commit markers in ``{path}/_current/{prefix}-v{N}`` (one tiny
file per committed version, created once, never rewritten — the
VERSION IS THE FILENAME, so even a torn content write cannot corrupt
the pointer).  Readers resolve the highest committed N; writers build
``{prefix}-v{N+1}`` fully, then create its marker (the atomic commit),
then garbage-collect older versions.  A crash before the marker leaves
an unreferenced directory (clobbered by the next writer); a crash
during GC leaves extra history (collected by the next GC); readers see
a complete, consistent version at every intermediate state.  Legacy
stores with no markers resolve to the unversioned ``{path}/{prefix}``
directory, so the first compact migrates them in place.

Reader contract: a DataFrame resolved BEFORE a compact points at the
old version's files, which GC deletes after the commit — re-resolve
(reload the store) after maintenance instead of re-executing stale
handles.  A deployment that must keep long-running readers alive
across maintenance simply defers ``gc_versions`` (the commit does not
require it); old versions are plain directories and any later GC
collects them.
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


# -- versioned-directory commit protocol (module docstring, para 2) ---------


def _marker_dir(path: str) -> str:
    return f"{path}/_current"


def committed_versions(spark, path: str, prefix: str) -> list[int]:
    """Committed version numbers for ``prefix`` under ``path``
    (ascending; [] for a legacy or empty store)."""
    head = f"{prefix}-v"
    out = []
    for name in list_names(spark, _marker_dir(path)):
        if name.startswith(head):
            try:
                out.append(int(name[len(head):]))
            except ValueError:
                continue
    return sorted(out)


def resolve_version(spark, path: str, prefix: str, *, legacy: str | None = None) -> str:
    """Data root of the highest COMMITTED version of ``prefix``, or
    the legacy unversioned location when no marker exists (default
    ``{path}/{prefix}``; pass ``legacy`` for stores whose pre-version
    layout lived elsewhere — e.g. IndexDelta's fields directly under
    the store root).  Uncommitted directories (a writer crashed before
    its marker create) are invisible here by construction."""
    vs = committed_versions(spark, path, prefix)
    if vs:
        return f"{path}/{prefix}-v{vs[-1]}"
    return legacy if legacy is not None else f"{path}/{prefix}"


def next_version(spark, path: str, prefix: str) -> int:
    """The version number a writer should build next: one past the
    max over BOTH committed markers and on-disk ``{prefix}-v*``
    directories, so an uncommitted leftover from a crashed writer is
    never half-reused under a live reader's feet (the writer's
    ``mode("overwrite")`` still clobbers its own target cleanly)."""
    head = f"{prefix}-v"
    seen = committed_versions(spark, path, prefix)
    for name in list_names(spark, path):
        if name.startswith(head):
            try:
                seen.append(int(name[len(head):]))
            except ValueError:
                continue
    return max(seen, default=-1) + 1


def commit_version(spark, path: str, prefix: str, n: int) -> None:
    """THE commit point: create the ``{prefix}-v{n}`` marker.  One
    single-file create — atomic everywhere; filename carries the
    version, content is informational only."""
    write_text(spark, f"{_marker_dir(path)}/{prefix}-v{n}", f"{prefix}-v{n}")


def gc_versions(spark, path: str, prefix: str, *, extra: tuple = ()) -> None:
    """Best-effort cleanup after a commit: drop markers below the
    current version FIRST, then every data directory at a version
    STRICTLY BELOW the current one (including the legacy unversioned
    one, plus any ``extra`` legacy paths — stores whose pre-version
    layout was not ``{path}/{prefix}``).  Directories at a HIGHER
    version than the committed pointer are left alone: a concurrent
    writer may be mid-build there, and deleting its uncommitted work
    under it would corrupt the very commit it is about to make
    (``next_version`` already refuses to reuse such leftovers; an
    abandoned one is reclaimed by :func:`purge_versions` on the next
    full rebuild).  Any crash mid-GC leaves only extra history — the
    invariant 'highest marker's directory exists and is complete'
    holds at every step."""
    vs = committed_versions(spark, path, prefix)
    if not vs:
        return
    cur = vs[-1]
    for n in vs[:-1]:
        delete(spark, f"{_marker_dir(path)}/{prefix}-v{n}")
    head = f"{prefix}-v"
    for name in list_names(spark, path):
        if name == prefix:
            delete(spark, f"{path}/{name}")
        elif name.startswith(head):
            try:
                v = int(name[len(head):])
            except ValueError:
                # unparseable suffix ("delta-v3.tmp", editor junk) can
                # never be a concurrent writer's valid in-progress
                # version — reclaim it, matching the old startswith rule
                delete(spark, f"{path}/{name}")
                continue
            if v < cur:
                delete(spark, f"{path}/{name}")
    for p in extra:
        delete(spark, p)


def purge_versions(spark, path: str, prefix: str) -> None:
    """Remove EVERY version, marker, and the legacy directory of a
    ``prefix`` family — the re-save (full rebuild) path, where stale
    data surviving under the new store would corrupt later merges."""
    for name in list_names(spark, _marker_dir(path)):
        if name.startswith(f"{prefix}-v"):
            delete(spark, f"{_marker_dir(path)}/{name}")
    for name in list_names(spark, path):
        if name == prefix or name.startswith(f"{prefix}-v"):
            delete(spark, f"{path}/{name}")
