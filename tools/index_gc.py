"""Garbage-collect stale write-once index directories.

Index dirs (operators/neardup_index.py, operators/ann_index.py,
plans/ml_ops.py) are keyed by ``{sf_name}-m{mtime_ns}-s{size}-...`` of
their source parquet, so a regenerated testdata file silently orphans
every index built against the previous generation. This tool removes
any index dir whose (mtime_ns, size) no longer matches a live source
file; current-generation dirs are kept.

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


def _live_keys() -> set[tuple[str, int, int]]:
    keys = set()
    roots = glob.glob("/root/testdata/sf*") + glob.glob(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "_scaledata",
            "sf*",
        )
    )
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


def gc(dry_run: bool = False) -> tuple[list[str], list[str]]:
    """Returns (kept, removed) index dir names across BOTH index
    roots (.cache/neardup_index and .cache/ann_index)."""
    import time

    from datapipelinedemo_spark.operators import ann_index, neardup_index

    live = _live_keys()
    kept, removed = [], []
    now = time.time()
    roots = {neardup_index._index_root(), ann_index._index_root()}
    for root in sorted(roots):
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if not os.path.isdir(path):
                continue
            if ".tmp-" in name:
                # crashed-builder leftovers only; never race a live one
                if now - os.path.getmtime(path) > _TMP_MAX_AGE_S:
                    removed.append(name)
                    if not dry_run:
                        shutil.rmtree(path, ignore_errors=True)
                else:
                    kept.append(name)
                continue
            m = _TAG.match(name)
            stale = m is None or (
                (m["sf"], int(m["mtime"]), int(m["size"])) not in live
            )
            if stale:
                removed.append(name)
                if not dry_run:
                    shutil.rmtree(path, ignore_errors=True)
            else:
                kept.append(name)
    return kept, removed


def main() -> None:
    dry = "--dry-run" in sys.argv
    kept, removed = gc(dry_run=dry)
    verb = "would remove" if dry else "removed"
    print(f"kept {len(kept)} index dirs; {verb} {len(removed)}:")
    for name in removed:
        print(f"  {name}")


if __name__ == "__main__":
    main()
