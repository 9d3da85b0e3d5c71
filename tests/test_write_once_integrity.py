"""Corruption-proofing of the write-once index protocol.

Round 6's driver run proved the failure mode: an external process
merged a SECOND copy of every part file into the committed sf0.01
index dirs, and the then-trusting ``spark.read.parquet(dest)`` served
every row twice — silent wrong answers in four catalog queries. These
tests pin the fix (``operators.write_once``): reads are pinned to the
manifest's part-file list, and any drift between manifest and disk is
either ignored (foreign files), rebuilt (at the ensure/cache layer),
or raised (at the raw read layer) — never silently served.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from datapipelinedemo_spark.operators import ann_index as AX
from datapipelinedemo_spark.operators import neardup_index as NX
from datapipelinedemo_spark.operators import write_once as WO


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    monkeypatch.setenv(NX.INDEX_DIR_ENV, str(tmp_path))
    return tmp_path


def _committed_dir(index_root) -> str:
    dirs = [d for d in os.listdir(index_root) if ".tmp-" not in d]
    assert len(dirs) == 1
    return os.path.join(index_root, dirs[0])


def _parts(frame_dir: str) -> list[str]:
    return sorted(
        n for n in os.listdir(frame_dir) if n.endswith(".parquet")
    )


def _plant_foreign(frame_dir: str) -> None:
    """Simulate the round-6 directory merge: a second copy of every
    part file lands under a fresh part-style name."""
    for i, name in enumerate(_parts(frame_dir)):
        shutil.copyfile(
            os.path.join(frame_dir, name),
            os.path.join(
                frame_dir, f"part-0009{i}-deadbeef-c000.snappy.parquet"
            ),
        )


def test_manifest_written_at_commit(spark, sf_dir, index_root):
    NX.simhash_index(spark, sf_dir, bits=16)
    dest = _committed_dir(index_root)
    with open(os.path.join(dest, WO.MANIFEST_NAME)) as fh:
        m = json.load(fh)
    assert m["files"] == _parts(dest)
    assert m["rows"] == sum(m["file_rows"].values()) > 0


def test_foreign_part_file_is_ignored(spark, sf_dir, index_root):
    """The round-6 incident in miniature: duplicate every committed
    part file under a fresh part-style name (a directory merge of a
    second build). The pinned read must serve the ORIGINAL row count,
    not double it."""
    base = NX.simhash_index(spark, sf_dir, bits=16)
    want = base.count()
    dest = _committed_dir(index_root)
    _plant_foreign(dest)
    again = NX.simhash_index(spark, sf_dir, bits=16)
    assert again.count() == want
    # and the raw pinned read agrees
    assert WO.read_frame(spark, dest).count() == want


def test_missing_part_file_raises_on_raw_read(spark, sf_dir, index_root):
    NX.simhash_index(spark, sf_dir, bits=16)
    dest = _committed_dir(index_root)
    os.remove(os.path.join(dest, _parts(dest)[0]))
    with pytest.raises(WO.IndexIntegrityError, match="missing part file"):
        WO.read_frame(spark, dest)


def test_missing_part_file_rebuilds_at_cache_layer(spark, sf_dir, index_root):
    base = NX.simhash_index(spark, sf_dir, bits=16)
    want = base.count()
    dest = _committed_dir(index_root)
    os.remove(os.path.join(dest, _parts(dest)[0]))
    # the cache entry point validates before serving: a torn dir is
    # rebuilt from source, not trusted
    assert NX.simhash_index(spark, sf_dir, bits=16).count() == want
    assert WO.dir_is_valid(_committed_dir(index_root))


def test_row_drift_in_listed_file_is_detected(spark, sf_dir, index_root):
    """A listed part file whose footer row count no longer matches the
    manifest (overwritten in place) must not be served."""
    want = NX.simhash_index(spark, sf_dir, bits=16).count()
    dest = _committed_dir(index_root)
    # overwrite the first listed file in place with a doubled copy —
    # row-count drift the footer check must catch
    import pyarrow as pa
    import pyarrow.parquet as pq

    victim = os.path.join(dest, _parts(dest)[0])
    t = pq.read_table(victim)
    pq.write_table(pa.concat_tables([t, t]), victim)
    with pytest.raises(WO.IndexIntegrityError, match="row drift"):
        WO.read_frame(spark, dest)
    # and the cache layer rebuilds instead of serving doubled rows
    assert NX.simhash_index(spark, sf_dir, bits=16).count() == want


def test_legacy_manifestless_dir_rebuilds(spark, sf_dir, index_root):
    base = NX.simhash_index(spark, sf_dir, bits=16)
    want = base.count()
    dest = _committed_dir(index_root)
    os.remove(os.path.join(dest, WO.MANIFEST_NAME))
    with pytest.raises(WO.IndexIntegrityError, match="no readable"):
        WO.read_frame(spark, dest)
    assert NX.simhash_index(spark, sf_dir, bits=16).count() == want
    assert os.path.isfile(
        os.path.join(_committed_dir(index_root), WO.MANIFEST_NAME)
    )


def test_multi_frame_dirs_each_get_manifest(spark, sf_dir, index_root):
    sh, bd = NX.neardup_index(spark, sf_dir, num_hashes=8, bands=2, k=9)
    dest = _committed_dir(index_root)
    for sub in ("shingles", "banded"):
        fd = os.path.join(dest, sub)
        with open(os.path.join(fd, WO.MANIFEST_NAME)) as fh:
            m = json.load(fh)
        assert m["files"] == _parts(fd)
    # planting foreign files in ONE frame leaves both reads exact
    want_sh, want_bd = sh.count(), bd.count()
    _plant_foreign(os.path.join(dest, "shingles"))
    sh2, bd2 = NX.neardup_index(spark, sf_dir, num_hashes=8, bands=2, k=9)
    assert (sh2.count(), bd2.count()) == (want_sh, want_bd)


def test_ann_index_uses_pinned_reads(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv(AX.INDEX_DIR_ENV, str(tmp_path))
    base = AX.lsh_index(spark, sf_dir, planes=8, bands=4, dim=64)
    want = base.count()
    dest = _committed_dir(tmp_path)
    _plant_foreign(dest)
    assert AX.lsh_index(spark, sf_dir, planes=8, bands=4, dim=64).count() == want


def test_foreign_parts_listed_and_gc_purges(spark, sf_dir, index_root):
    """GC detects the round-6 merge signature (unlisted part files in
    a valid dir) and purges just the junk, keeping the index."""
    import pyarrow.parquet as pq

    NX.simhash_index(spark, sf_dir, bits=16)
    dest = _committed_dir(index_root)
    assert WO.foreign_parts(dest) == []
    _plant_foreign(dest)
    fp = WO.foreign_parts(dest)
    assert len(fp) == len(json.load(open(os.path.join(dest, WO.MANIFEST_NAME)))["files"])
    # still valid (reads ignore foreign files)
    assert WO.dir_is_valid(dest)
    # GC (pointed at this root via the env var the fixture set) purges
    import tools.index_gc as gc_mod

    os.environ[gc_mod.SOURCE_ROOTS_ENV] = sf_dir.rsplit("/", 1)[0] + "/sf*"
    try:
        kept, removed, skipped = gc_mod.gc(dry_run=False)
    finally:
        del os.environ[gc_mod.SOURCE_ROOTS_ENV]
    assert any("foreign part files" in r for r in removed)
    assert WO.foreign_parts(dest) == []
    assert WO.dir_is_valid(dest)
    # the index still reads exactly its manifest rows
    m = json.load(open(os.path.join(dest, WO.MANIFEST_NAME)))
    assert WO.read_frame(spark, dest).count() == m["rows"]


def test_concurrent_builders_one_valid_winner(tmp_path):
    """Two threads race ensure_dir on the same (legacy-invalid) dest
    with slow builders: exactly one valid committed dir must result,
    neither thread may crash, and the loser must not delete the
    winner's commit (the rename-claim protocol). Engine-agnostic:
    builders write parquet via pyarrow, no Spark involved."""
    import threading
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    dest = str(tmp_path / "idx")
    # legacy manifest-less dir — both threads will see it invalid
    os.makedirs(dest)
    pq.write_table(
        pa.table({"x": list(range(7))}),
        os.path.join(dest, "part-legacy.snappy.parquet"),
    )

    def build(rows):
        def _b(tmp):
            os.makedirs(tmp, exist_ok=True)
            time.sleep(0.3)  # widen the race window
            pq.write_table(
                pa.table({"x": list(range(rows))}),
                os.path.join(tmp, "part-00000-new.snappy.parquet"),
            )
        return _b

    errors = []

    def run(rows):
        try:
            WO.ensure_dir(dest, build(rows))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=run, args=(5,))
    t2 = threading.Thread(target=run, args=(9,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert errors == []
    assert WO.dir_is_valid(dest)
    m = json.load(open(os.path.join(dest, WO.MANIFEST_NAME)))
    # one build won wholesale: manifest rows are one builder's output,
    # and the files on disk are exactly the manifest's
    assert m["rows"] in (5, 9)
    assert sorted(
        n for n in os.listdir(dest) if n.endswith(".parquet")
    ) == m["files"]
    # no stale claim/tmp litter left behind
    siblings = os.listdir(tmp_path)
    assert [d for d in siblings if ".tmp-" in d or ".stale-" in d] == []


def _mk_frame(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "x long")


def test_append_frame_commits_manifest_pinned_generation(
    spark, tmp_path
):
    """append_frame adds a new frame dir with its own manifest beside
    the base; the whole index stays valid and both generations read
    back pinned."""
    dest = str(tmp_path / "idx")
    WO.ensure_dir(
        dest,
        lambda tmp: _mk_frame(spark, [1, 2]).write.parquet(
            os.path.join(tmp, "base")
        ),
    )
    frame = WO.append_frame(
        dest,
        "batch_0",
        lambda tmp: _mk_frame(spark, [3]).write.parquet(tmp),
    )
    assert os.path.exists(os.path.join(frame, WO.MANIFEST_NAME))
    assert WO.dir_is_valid(dest)
    got = sorted(
        r.x
        for d in ("base", "batch_0")
        for r in WO.read_frame(spark, os.path.join(dest, d)).collect()
    )
    assert got == [1, 2, 3]


def test_append_frame_is_idempotent_per_batch_name(spark, tmp_path):
    """A second append under the same name keeps the committed frame
    (batch content is deterministic per batch id) — no duplication,
    no rewrite."""
    dest = str(tmp_path / "idx")
    WO.ensure_dir(
        dest,
        lambda tmp: _mk_frame(spark, [1]).write.parquet(
            os.path.join(tmp, "base")
        ),
    )
    WO.append_frame(
        dest,
        "batch_0",
        lambda tmp: _mk_frame(spark, [7, 8]).write.parquet(tmp),
    )
    m1 = json.load(
        open(os.path.join(dest, "batch_0", WO.MANIFEST_NAME))
    )
    calls = []
    WO.append_frame(
        dest,
        "batch_0",
        lambda tmp: calls.append(tmp),  # must never run
    )
    assert calls == []
    m2 = json.load(
        open(os.path.join(dest, "batch_0", WO.MANIFEST_NAME))
    )
    assert m1 == m2


def test_append_frame_replaces_corrupt_half_written_batch(
    spark, tmp_path
):
    """A manifest-less (half-written) batch dir is torn down and
    rebuilt instead of trusted."""
    dest = str(tmp_path / "idx")
    WO.ensure_dir(
        dest,
        lambda tmp: _mk_frame(spark, [1]).write.parquet(
            os.path.join(tmp, "base")
        ),
    )
    half = os.path.join(dest, "batch_0")
    os.makedirs(half)
    with open(os.path.join(half, "part-junk.parquet"), "w") as fh:
        fh.write("not parquet")
    WO.append_frame(
        dest,
        "batch_0",
        lambda tmp: _mk_frame(spark, [9]).write.parquet(tmp),
    )
    assert WO.dir_is_valid(dest)
    got = [
        r.x
        for r in WO.read_frame(
            spark, os.path.join(dest, "batch_0")
        ).collect()
    ]
    assert got == [9]


def test_transient_append_litter_does_not_invalidate_index(
    spark, tmp_path
):
    """ADVICE r11: an in-flight (or interrupted) append's tmp dir lives
    INSIDE dest and holds parquet files without a manifest during its
    build window. ``dir_is_valid`` / ``ensure_dir`` must not judge the
    whole index invalid because of it — that would tear down the valid
    base plus the in-flight append."""
    dest = str(tmp_path / "idx")
    WO.ensure_dir(
        dest,
        lambda tmp: _mk_frame(spark, [1, 2]).write.parquet(
            os.path.join(tmp, "base")
        ),
    )
    # simulate the mid-append window: parquet files, no manifest yet
    litter = os.path.join(dest, "batch_0.tmp-deadbeef")
    _mk_frame(spark, [9]).write.parquet(litter)
    assert WO.MANIFEST_NAME not in os.listdir(litter)
    stale = os.path.join(dest, "batch_1.stale-cafef00d")
    _mk_frame(spark, [8]).write.parquet(stale)

    assert WO.dir_is_valid(dest)
    base_manifest = json.load(
        open(os.path.join(dest, "base", WO.MANIFEST_NAME))
    )
    calls = []
    WO.ensure_dir(dest, lambda tmp: calls.append(tmp))  # must not rebuild
    assert calls == []
    assert base_manifest == json.load(
        open(os.path.join(dest, "base", WO.MANIFEST_NAME))
    )
    # the litter is invisible to frame enumeration but still on disk
    assert os.path.isdir(litter)
    assert all(
        ".tmp-" not in os.path.basename(f) and ".stale-" not in os.path.basename(f)
        for f in WO._frame_dirs(dest)
    )


def test_pq_index_read_codes_skips_transient_litter(spark, tmp_path):
    """ADVICE r11: pq_index_read_codes selected subdirs by
    startswith('batch_'), which also matched transient litter
    (batch_0.tmp-xxxx) and made read_frame raise IndexIntegrityError
    on the manifest-less dir — crashing every serve from an
    otherwise-valid index."""
    from datapipelinedemo_spark.plans.ml_ops import (
        pq_index_append_batch,
        pq_index_read_codes,
    )

    def _codes(vals):
        return spark.createDataFrame(
            [(v, [v % 7, v % 5]) for v in vals],
            "vec_id long, codes array<int>",
        )

    dest = str(tmp_path / "pqidx")
    WO.ensure_dir(
        dest,
        lambda tmp: _codes([1, 2]).write.parquet(os.path.join(tmp, "base")),
    )
    pq_index_append_batch(dest, _codes([3]), name="batch_0")
    # interrupted second append: parquet litter, no manifest
    _codes([99]).write.parquet(os.path.join(dest, "batch_1.tmp-1234abcd"))
    _codes([98]).write.parquet(os.path.join(dest, "batch_0.stale-87654321"))

    got = sorted(r.vec_id for r in pq_index_read_codes(spark, dest).collect())
    assert got == [1, 2, 3]
