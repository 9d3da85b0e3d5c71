"""Garbage-collect stale write-once index directories.

Index dirs (operators/neardup_index.py, operators/ann_index.py,
plans/ml_ops.py) are keyed by ``{sf_name}-m{mtime_ns}-s{size}-...`` of
their source parquet, so a regenerated testdata file silently orphans
every index built against the previous generation. This tool removes
any index dir whose (mtime_ns, size) no longer matches a live source
file; current-generation dirs are kept. Dirs failing the
``write_once`` manifest integrity check (torn writes, drifted or
missing listed files, legacy manifest-less dirs) are reported as
CORRUPT and removed so the next consumer rebuilds clean. Foreign part
files merged into an otherwise-valid dir (the round-6 incident —
reads ignore them, but they waste disk) are purged surgically,
keeping the index.

Directories whose names don't match the tag format are reported and
SKIPPED, never deleted — an unrecognized name means "not ours", not
"stale" (indexes from other corpus roots, future tag formats).

Source roots default to /root/testdata/sf* and <repo>/_scaledata/sf*;
override or extend with SPARK_GRAFT_SOURCE_ROOTS (colon-separated
globs of sf dirs).

Usage:
    python tools/index_gc.py            # report + delete stale dirs
    python tools/index_gc.py --dry-run  # report only
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TAG = re.compile(r"^(?P<sf>.+)-m(?P<mtime>\d+)-s(?P<size>\d+)-")

# every source file an index tag can be derived from, per sf dir
_SOURCES = ("documents.parquet", "embeddings.parquet")

SOURCE_ROOTS_ENV = "SPARK_GRAFT_SOURCE_ROOTS"
_DEFAULT_ROOT_GLOBS = (
    "/root/testdata/sf*",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_scaledata",
        "sf*",
    ),
)


def _source_root_globs() -> tuple[str, ...]:
    env = os.environ.get(SOURCE_ROOTS_ENV)
    if env:
        return tuple(g for g in env.split(":") if g)
    return _DEFAULT_ROOT_GLOBS


def _live_keys() -> set[tuple[str, int, int]]:
    keys = set()
    roots: list[str] = []
    for pat in _source_root_globs():
        roots.extend(glob.glob(pat))
    for root in roots:
        sf_name = os.path.basename(os.path.normpath(root))
        for src in _SOURCES:
            p = os.path.join(root, src)
            if os.path.exists(p):
                st = os.stat(p)
                keys.add((sf_name, st.st_mtime_ns, st.st_size))
    return keys


# .tmp dirs younger than this may belong to a LIVE builder (the
# atomic write-then-rename window) — removing one mid-build would
# fail that build's rename/read. Older ones are crashed builders.
_TMP_MAX_AGE_S = 6 * 3600


def gc(dry_run: bool = False) -> tuple[list[str], list[str], list[str]]:
    """Returns (kept, removed, skipped) index dir names across BOTH
    index roots (.cache/neardup_index and .cache/ann_index). Removed
    entries are annotated ``name (stale)`` / ``(corrupt)`` /
    ``(crashed tmp)``; skipped ones are unrecognized names left alone.
    """
    import time

    from datapipelinedemo_spark.operators import ann_index, neardup_index
    from datapipelinedemo_spark.operators.write_once import (
        dir_is_valid,
        foreign_parts,
    )

    live = _live_keys()
    kept, removed, skipped = [], [], []
    now = time.time()
    roots = {neardup_index._index_root(), ann_index._index_root()}

    def _rm(path: str, name: str, why: str) -> None:
        removed.append(f"{name} ({why})")
        if not dry_run:
            shutil.rmtree(path, ignore_errors=True)

    for root in sorted(roots):
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if not os.path.isdir(path):
                continue
            if ".tmp-" in name or ".stale-" in name:
                # crashed-builder leftovers only; never race a live
                # one. ``.stale-`` dirs are ensure_dir's claimed-for-
                # teardown copies (write_once.py): a crash between the
                # claim rename and the cleanup orphans one, and no
                # consumer can ever read it — without this branch the
                # tag regex would match (the name starts with the
                # original live tag) and classify it "kept" forever
                # (ADVICE r7 #3).
                if now - os.path.getmtime(path) > _TMP_MAX_AGE_S:
                    why = "crashed tmp" if ".tmp-" in name else "orphaned stale"
                    _rm(path, name, why)
                else:
                    kept.append(name)
                continue
            m = _TAG.match(name)
            if m is None:
                # not our tag format — report, never delete
                skipped.append(name)
                continue
            if (m["sf"], int(m["mtime"]), int(m["size"])) not in live:
                _rm(path, name, "stale")
            elif not dir_is_valid(path):
                # manifest missing/mismatched: torn writes, drifted
                # or deleted listed files, or a pre-manifest legacy
                # dir. Readers would rebuild anyway; GC makes the
                # rebuild explicit.
                _rm(path, name, "corrupt")
            else:
                fp = foreign_parts(path)
                if fp:
                    # valid index + unlisted part files (the round-6
                    # merge signature): purge just the junk, keep the
                    # index — reads never touched those files
                    removed.append(
                        f"{name} (purged {len(fp)} foreign part files)"
                    )
                    if not dry_run:
                        for f in fp:
                            try:
                                os.remove(f)
                            except OSError:
                                pass
                kept.append(name)
    return kept, removed, skipped


def main() -> None:
    dry = "--dry-run" in sys.argv
    kept, removed, skipped = gc(dry_run=dry)
    verb = "would remove" if dry else "removed"
    print(f"kept {len(kept)} index dirs; {verb} {len(removed)}:")
    for name in removed:
        print(f"  {name}")
    if skipped:
        print(f"skipped {len(skipped)} unrecognized dirs (not touched):")
        for name in skipped:
            print(f"  {name}")


if __name__ == "__main__":
    main()
