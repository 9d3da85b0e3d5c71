"""Write-once parquet frames with manifest-pinned, corruption-proof reads.

One protocol for every materialized index in the repo (near-dup
shingle/banded frames, SimHash signatures, winnowed fingerprints, the
ANN hyperplane index, the k-means assignment cache). Previously each
site hand-rolled the same stat/tmp-write/``os.rename`` sequence and
read back with a bare ``spark.read.parquet(dest)`` — i.e. "trust
whatever part files are in the directory". Round 6 showed why that is
wrong at any scale: an external process merged a second copy of every
part file into the sf0.01 index dirs and five queries silently served
doubled rows. A production index read must pin exactly the files the
build committed.

Protocol:

- ``ensure_dir(dest, build)``: if ``dest`` is not a *valid* committed
  index (manifest present in every frame dir, every listed file
  present, parquet-footer row counts matching), (re)build it: run
  ``build(tmp)`` against a temp sibling, write a ``manifest.json``
  into each frame directory (part-file names + per-file and total row
  counts, straight from the parquet footers — no Spark job), then
  ``os.rename`` the temp dir into place. Concurrent builders race
  benignly: the rename loser validates the winner's copy and discards
  its own. A legacy or corrupted ``dest`` is torn down and rebuilt —
  corruption costs a rebuild, never a wrong answer.
- ``read_frame(spark, frame_dir)``: load the manifest and scan exactly
  its file list (``spark.read.parquet(*files)``) after re-checking the
  footers against the recorded row counts. Foreign part files dropped
  into the directory are never read; a missing or truncated listed
  file or a row-count drift raises ``IndexIntegrityError`` instead of returning
  doubled/truncated data.

Validation cost is parquet FOOTERS only (pyarrow metadata, no data
pages, no Spark jobs) — microseconds per file, negligible next to the
scan it guards.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "manifest.json"


class IndexIntegrityError(RuntimeError):
    """A committed write-once index no longer matches its manifest."""


def _is_frame_dir(path: str) -> bool:
    try:
        names = os.listdir(path)
    except OSError:
        return False
    return any(n.endswith(".parquet") for n in names)


def _is_transient_name(name: str) -> bool:
    """In-flight build (`<name>.tmp-xxxx`) and claimed-for-teardown
    (`<name>.stale-xxxx`) directories from this module's own commit
    protocol. They hold parquet files without (or with a not-yet-final)
    manifest during their window, so treating them as frames would make
    a concurrent ``dir_is_valid`` judge a valid index invalid and tear
    down the base plus the in-flight append (ADVICE r11)."""
    return ".tmp-" in name or ".stale-" in name


def _frame_dirs(root: str) -> list[str]:
    """The parquet frame directories under ``root``: ``root`` itself if
    it holds part files directly, else its immediate subdirectories
    that do (the shingles/banded layout). An empty result means the
    build wrote nothing — treated as invalid. Transient tmp/stale dirs
    from in-flight commits are never frames."""
    if _is_frame_dir(root):
        return [root]
    try:
        subs = sorted(os.listdir(root))
    except OSError:
        return []
    return [
        os.path.join(root, s)
        for s in subs
        if not _is_transient_name(s)
        and _is_frame_dir(os.path.join(root, s))
    ]


def _footer_rows(path: str) -> int:
    return pq.ParquetFile(path).metadata.num_rows


def write_manifest(frame_dir: str) -> dict:
    """Record the part files the build just wrote (names + footer row
    counts). Called on the TEMP dir before the commit rename, so the
    manifest and the files it pins become visible atomically."""
    files = sorted(
        n for n in os.listdir(frame_dir) if n.endswith(".parquet")
    )
    per_file = {n: _footer_rows(os.path.join(frame_dir, n)) for n in files}
    manifest = {
        "files": files,
        "file_rows": per_file,
        "rows": sum(per_file.values()),
    }
    with open(os.path.join(frame_dir, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def _load_manifest(frame_dir: str) -> dict | None:
    try:
        with open(os.path.join(frame_dir, MANIFEST_NAME)) as fh:
            m = json.load(fh)
    except (OSError, ValueError):
        return None
    if not isinstance(m, dict) or "files" not in m or "file_rows" not in m:
        return None
    return m


def _check_frame(frame_dir: str, manifest: dict) -> str | None:
    """None if the frame matches its manifest, else a reason string."""
    for name in manifest["files"]:
        path = os.path.join(frame_dir, name)
        if not os.path.isfile(path):
            return f"missing part file {name!r}"
        try:
            rows = _footer_rows(path)
        except Exception as e:  # unreadable footer == corrupt file
            return f"unreadable part file {name!r}: {e}"
        want = manifest["file_rows"].get(name)
        if rows != want:
            return f"row drift in {name!r}: footer {rows} != manifest {want}"
    return None


def dir_is_valid(dest: str) -> bool:
    """Every frame dir under ``dest`` has a manifest that matches the
    files on disk. Extra (foreign) part files do NOT invalidate a dir —
    the pinned read ignores them — but a missing manifest (legacy or
    half-written dir) does."""
    frames = _frame_dirs(dest)
    if not frames:
        return False
    for fd in frames:
        m = _load_manifest(fd)
        if m is None or _check_frame(fd, m) is not None:
            return False
    return True


def foreign_parts(dest: str) -> list[str]:
    """Absolute paths of part files on disk that are NOT listed in
    their frame's manifest — harmless to reads (the pinned scan never
    touches them) but wasted disk and the signature of the round-6
    external-merge incident. ``tools/index_gc.py`` purges them."""
    out: list[str] = []
    for fd in _frame_dirs(dest):
        m = _load_manifest(fd)
        if m is None:
            continue
        listed = set(m["files"])
        out.extend(
            os.path.join(fd, n)
            for n in os.listdir(fd)
            if n.endswith(".parquet") and n not in listed
        )
    return out


def ensure_dir(dest: str, build) -> None:
    """Make ``dest`` a valid committed index, (re)building if needed.

    ``build(tmp_dir)`` must write one parquet frame at ``tmp_dir`` or
    several as ``tmp_dir/<name>`` subdirectories. Manifests are written
    into the temp tree, then the whole tree is renamed into place —
    readers never observe a manifest-less committed dir.
    """
    if dir_is_valid(dest):
        return
    if os.path.isdir(dest):
        # legacy (pre-manifest) or corrupted: rebuild from source. The
        # index is derived data; a rebuild is always safe, a trusting
        # read is not. Claim the doomed dir with an atomic RENAME
        # rather than rmtree-ing in place — a concurrent builder may
        # have committed a fresh valid index between our validity
        # check and this line, and deleting that would orphan its
        # already-returned manifest-pinned scans.
        trash = dest + f".stale-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(dest, trash)
        except OSError:
            pass  # another builder already claimed or replaced it
        else:
            if dir_is_valid(trash):
                # we grabbed a concurrent builder's fresh commit —
                # put it back (or drop ours if dest got rebuilt again)
                try:
                    os.rename(trash, dest)
                except OSError:
                    shutil.rmtree(trash, ignore_errors=True)
                if dir_is_valid(dest):
                    return
            else:
                shutil.rmtree(trash, ignore_errors=True)
    tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
        frames = _frame_dirs(tmp)
        if not frames:
            raise IndexIntegrityError(
                f"index build for {dest!r} wrote no parquet files"
            )
        for fd in frames:
            write_manifest(fd)
        try:
            os.rename(tmp, dest)
        except OSError:
            # another builder won the race — validate and use theirs
            if not dir_is_valid(dest):
                raise IndexIntegrityError(
                    f"concurrent build of {dest!r} left an invalid dir"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def append_frame(dest: str, name: str, build) -> str:
    """Commit ONE MORE frame dir ``dest/name`` into an existing
    committed index — the ingest-append step of a serving index
    (streaming PQ admission, incremental dedup): the base generation
    is immutable, each admitted batch lands as its own
    manifest-pinned frame, and readers union the frames. Idempotent:
    an already-committed valid ``dest/name`` is kept as-is (batch
    content is deterministic per batch id); a half-written or
    corrupted one is replaced. Same tmp-build → manifest → atomic
    rename protocol as ``ensure_dir``, so concurrent appenders of the
    same batch race benignly. Returns the committed frame dir."""
    frame = os.path.join(dest, name)
    m = _load_manifest(frame)
    if m is not None and _check_frame(frame, m) is None:
        return frame
    if os.path.isdir(frame):
        trash = frame + f".stale-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(frame, trash)
        except OSError:
            pass
        else:
            shutil.rmtree(trash, ignore_errors=True)
    tmp = frame + f".tmp-{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
        if not _is_frame_dir(tmp):
            raise IndexIntegrityError(
                f"batch append for {frame!r} wrote no parquet files"
            )
        write_manifest(tmp)
        try:
            os.rename(tmp, frame)
        except OSError:
            m = _load_manifest(frame)
            if m is None or _check_frame(frame, m) is not None:
                raise IndexIntegrityError(
                    f"concurrent append of {frame!r} left an invalid dir"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return frame


def read_frame(spark: SparkSession, frame_dir: str) -> DataFrame:
    """Scan exactly the manifest's part files, re-checking footers
    first. Raises ``IndexIntegrityError`` on a missing manifest, a
    missing/drifted file — never silently serves a mutated directory.
    Foreign part files are simply not in the scan."""
    manifest = _load_manifest(frame_dir)
    if manifest is None:
        raise IndexIntegrityError(
            f"no readable {MANIFEST_NAME} in {frame_dir!r} — not a "
            "committed write-once index (delete the dir to rebuild)"
        )
    reason = _check_frame(frame_dir, manifest)
    if reason is not None:
        raise IndexIntegrityError(
            f"write-once index {frame_dir!r} fails integrity check: "
            f"{reason} (delete the dir to rebuild)"
        )
    files = [os.path.join(frame_dir, n) for n in manifest["files"]]
    return spark.read.parquet(*files)
