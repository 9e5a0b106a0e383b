"""Lake maintenance: vacuum (physical GC of superseded files) and
repartition (partition-count rewrite that resumes the same change log
from the carried watermark)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.maintain import (
    _data_files_on_disk,
    erase_keys,
    repartition_lake,
    vacuum,
)
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import (
    lineage_check,
    replay_oracle_table,
    tables_equal,
)
from go_data_publisher_ray.state.manifest import Manifest

P = 8


def test_vacuum_reclaims_superseded_files(ray_session, small_log, lake_dir):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=6)
    compact(lake_dir)  # folds 6 epochs; old base + deltas now superseded
    before = snapshot_table(lake_dir)
    n_files_before = len(_data_files_on_disk(lake_dir))

    r = vacuum(lake_dir)
    assert r["files_deleted"] > 0 and r["bytes_reclaimed"] > 0
    assert r["orphans_deleted"] == 0

    # exactly the live view remains on disk: one compacted base per part
    remaining = _data_files_on_disk(lake_dir)
    assert len(remaining) == P < n_files_before
    state = Manifest(lake_dir).load_state()
    live = {state.base[p].path for p in range(P)}
    assert set(remaining) == live

    after = snapshot_table(lake_dir)
    ok, msg = tables_equal(before, after)
    assert ok, msg
    # vacuum is idempotent
    assert vacuum(lake_dir)["files_deleted"] == 0

    # the lake keeps ingesting after vacuum
    apply_log(events, lake_dir)
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_vacuum_orphan_sweep(ray_session, small_log, lake_dir):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=2)
    # plant a crashed-apply leftover: an unreferenced delta + a write-temp
    pdir = os.path.join(lake_dir, "part=00000")
    pq.write_table(pa.table({"x": [1]}), os.path.join(pdir, "delta_crashed.parquet"))
    with open(os.path.join(pdir, "base_x.parquet.tmp-dead"), "wb") as f:
        f.write(b"junk")

    r = vacuum(lake_dir)  # default: orphans are NOT touched
    assert r["orphans_deleted"] == 0
    assert os.path.exists(os.path.join(pdir, "delta_crashed.parquet"))

    r = vacuum(lake_dir, include_orphans=True)
    assert r["orphans_deleted"] == 2
    assert not os.path.exists(os.path.join(pdir, "delta_crashed.parquet"))
    assert not os.path.exists(os.path.join(pdir, "base_x.parquet.tmp-dead"))
    assert lineage_check(lake_dir)["mismatches"] == []


def test_repartition_resumes_log(ray_session, small_log, tmp_path):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    bootstrap(base, src, P)
    results = apply_log(events, src, stop_after=6)
    applied = [r["epoch"] for r in results if not r.get("skipped")]

    r = repartition_lake(src, dst, 2 * P)
    assert r["partitions"] == 2 * P
    assert r["resumes_after_epoch"] == max(applied)

    # identical merged state at the new partition count
    ok, msg = tables_equal(snapshot_table(src), snapshot_table(dst))
    assert ok, msg
    man = Manifest(dst)
    assert man.num_partitions == 2 * P
    assert man.compaction_horizon() == max(applied)

    # resuming the SAME log: folded epochs are skipped, the rest apply;
    # final state matches the full replay oracle
    results = apply_log(events, dst)
    folded = [r for r in results if r.get("folded")]
    fresh = [r for r in results if not r.get("skipped")]
    assert {r["epoch"] for r in folded} == set(applied)
    assert fresh, "expected remaining epochs to apply on the new lake"
    got = snapshot_table(dst)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(got, want)
    assert ok, msg
    assert lineage_check(dst)["mismatches"] == []


def test_repartition_refuses_sharded_and_existing(ray_session, small_log, tmp_path):
    import pytest

    base = os.path.join(small_log, "base")
    sharded = str(tmp_path / "sharded")
    bootstrap(base, sharded, P, shard=(0, 2))
    with pytest.raises(ValueError, match="sharded"):
        repartition_lake(sharded, str(tmp_path / "x"), 2 * P)

    plain = str(tmp_path / "plain")
    bootstrap(base, plain, P)
    with pytest.raises(ValueError, match="already exists"):
        repartition_lake(plain, plain, 2 * P)


def test_erase_keys_physically_removes(ray_session, small_log, lake_dir):
    """GDPR erasure: no byte of the erased url survives anywhere under
    the lake root — not in the live view, not in history, not in any
    file on disk — and history reads that could resurface it are
    refused."""
    import glob

    import pytest

    from go_data_publisher_ray.pipelines.maintain import erase_keys
    from go_data_publisher_ray.pipelines.snapshot import lookup_keys, snapshot

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    full = snapshot_table(lake_dir)
    urls = sorted(full.column("url").to_pylist())
    victims = [urls[0], urls[-1]]
    survivors_rows = full.num_rows - 2

    r = erase_keys(lake_dir, victims)
    assert r["erased"] == 2
    assert r["vacuum"]["files_deleted"] > 0

    # gone from state and point reads
    after = snapshot_table(lake_dir)
    assert after.num_rows == survivors_rows
    assert set(victims).isdisjoint(after.column("url").to_pylist())
    assert lookup_keys(lake_dir, victims).num_rows == 0

    # gone from every file on disk under the lake root: value-level scan
    # of each parquet (raw-byte grep would pass vacuously on compressed
    # pages) plus a raw-byte check for the uncompressed footer/stats
    needles = [v.encode() for v in victims]
    files = glob.glob(os.path.join(lake_dir, "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        t = pq.read_table(f)
        for col in t.schema.names:
            if t.schema.field(col).type == pa.string():
                vals = set(t.column(col).to_pylist())
                assert vals.isdisjoint(victims), f"{col} of {f}"
        blob = open(f, "rb").read()
        for n in needles:
            assert n not in blob, f"{n!r} survives in {f}"

    # history that contained the key is unreadable (horizon moved)
    with pytest.raises(ValueError, match="compaction"):
        snapshot(lake_dir, upto_epoch=0).count()

    # untouched keys unchanged vs the pre-erasure view
    keep = full.filter(
        pc.invert(pc.is_in(full.column("url"), value_set=pa.array(victims)))
    )
    ok, msg = tables_equal(keep, after)
    assert ok, msg

    # idempotent: erasing again is a no-op
    r2 = erase_keys(lake_dir, victims)
    assert r2["erased"] == 0 and r2["epoch"] is None

    # the lake keeps working: later lookups, snapshots, lineage
    from go_data_publisher_ray.pipelines.verify import lineage_check

    assert lineage_check(lake_dir)["mismatches"] == []


def test_tail_terminates_on_repartitioned_lake(ray_session, small_log, tmp_path):
    """Review r3: folded-skipped epochs must not read as 'pending
    progress' — tail on a repartitioned lake has to go idle and return,
    not hot-spin re-skipping the folded epochs forever."""
    from go_data_publisher_ray.pipelines.tail import tail

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    bootstrap(base, src, P)
    apply_log(events, src, stop_after=6)
    repartition_lake(src, dst, 2 * P)

    results = tail(events, dst, poll_interval=0.05, max_idle_polls=2)
    applied = [r["epoch"] for r in results if not r.get("skipped")]
    assert applied == list(range(6, 10))  # only the epochs beyond the fence
    got = snapshot_table(dst)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_erase_epoch_collision_refused(ray_session, small_log, lake_dir, tmp_path):
    """Review r3: an upstream epoch arriving under a number claimed by
    an administrative (erasure) epoch must fail loudly, not be silently
    swallowed by the skip-committed check."""
    import shutil

    import pytest

    from go_data_publisher_ray.pipelines.maintain import erase_keys

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    url = snapshot_table(lake_dir).column("url")[0].as_py()
    r = erase_keys(lake_dir, [url])
    assert r["epoch"] == 10  # max committed (9) + 1

    # upstream later emits epoch 10: the collision must raise
    upstream2 = str(tmp_path / "more_events")
    shutil.copytree(events, upstream2)
    shutil.copytree(
        os.path.join(events, "epoch=9"), os.path.join(upstream2, "epoch=10")
    )
    with pytest.raises(ValueError, match="administrative"):
        apply_log(upstream2, lake_dir)


def test_repartition_keeps_fence_with_empty_partitions(ray_session, tmp_path):
    """Review r3: a destination partition that receives zero rows still
    needs a zero-row base entry, or compaction_horizon() collapses to -1
    and the whole already-ingested log re-applies."""
    import numpy as np

    tiny = str(tmp_path / "tiny")
    os.makedirs(os.path.join(tiny, "base"))
    base_t = pa.table(
        {
            "url": [f"https://t/{i}" for i in range(3)],
            "warc_ts": pa.array(
                np.array([1_700_000_000_000_000 + i for i in range(3)], "datetime64[us]")
            ),
            "html": [b"x", b"y", b"z"],
            "text": ["a", "b", "c"],
            "lang": ["en"] * 3,
            "lsn": pa.array([0, 0, 0], pa.int64()),
        }
    )
    pq.write_table(base_t, os.path.join(tiny, "base", "chunk-0.parquet"))
    edir = os.path.join(tiny, "events", "epoch=0")
    os.makedirs(edir)
    ev = pa.table(
        {
            "url": ["https://t/0"],
            "warc_ts": pa.array(
                np.array([1_700_000_001_000_000], "datetime64[us]")
            ),
            "html": [b"x2"],
            "text": ["a2"],
            "lang": ["en"],
            "lsn": pa.array([1], pa.int64()),
            "op": ["upsert"],
        }
    )
    pq.write_table(ev, os.path.join(edir, "chunk-0.parquet"))

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    bootstrap(os.path.join(tiny, "base"), src, 4)
    apply_log(os.path.join(tiny, "events"), src)
    r = repartition_lake(src, dst, 64)  # 3 keys over 64 partitions: most empty
    assert r["partitions"] == 64
    assert Manifest(dst).compaction_horizon() == 0  # fence survives

    results = apply_log(os.path.join(tiny, "events"), dst)
    assert all(res.get("skipped") for res in results)  # nothing re-applies
    ok, msg = tables_equal(snapshot_table(src), snapshot_table(dst))
    assert ok, msg


def test_repartition_carries_admin_epochs(ray_session, small_log, tmp_path):
    """ADVICE r4: the erase-epoch collision guard (admin_epochs in
    lake.json) must survive repartition_lake — otherwise an upstream
    epoch reusing an administrative number on the NEW lake is silently
    skipped as folded instead of refused."""
    import pytest

    from go_data_publisher_ray.pipelines.apply import apply_epoch
    from go_data_publisher_ray.pipelines.snapshot import snapshot_table as snap

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    bootstrap(base, src, 8)
    apply_log(events, src)
    victim = snap(src).column("url")[0].as_py()
    out = erase_keys(src, [victim])
    assert Manifest(src).admin_epochs == {out["epoch"]}

    repartition_lake(src, dst, 16)
    assert Manifest(dst).admin_epochs == {out["epoch"]}
    # and the guard actually fires on the new lake
    collide = str(tmp_path / "collide_events")
    os.makedirs(os.path.join(collide, f"epoch={out['epoch']}"))
    with pytest.raises(ValueError, match="administrative"):
        apply_log(collide, dst)
