"""Third lake entity: content-addressed identities (the computors
analog, K12 — `computors-consumer/consume/processor.go:146-173` skips
the write when an identical identity already exists).  The key IS the
content hash, merge is first-writer-wins, so an identical re-publish is
an end-to-end NO-OP: nothing changes in the lake, nothing appears on
the changefeed, nothing reaches a replica."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.schema import CONTENT_SPEC
from go_data_publisher_ray.state.manifest import Manifest

P = 4
N_BASE = 200
N_EPOCHS = 5
EVENTS_PER_EPOCH = 300


def _blob(i: int) -> bytes:
    return f"identity-payload-{i:06d}".encode() * 3


def _hash(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


def _rows(ids: np.ndarray, lsns: np.ndarray, epoch: int | None) -> pa.Table:
    blobs = [_blob(int(i)) for i in ids]
    cols = {
        "content_hash": pa.array([_hash(b) for b in blobs], pa.string()),
        "blob": pa.array(blobs, pa.binary()),
        "first_epoch": pa.array(ids % 7, pa.int32()),
        "lsn": pa.array(lsns, pa.int64()),
    }
    if epoch is not None:
        cols["op"] = pa.array(["upsert"] * len(ids), pa.string())
        cols["epoch"] = pa.array(np.full(len(ids), epoch), pa.int32())
    return pa.table(cols)


def _content_fixture(root: str) -> tuple[str, str]:
    """Base of N_BASE identities, then epochs mixing NEW identities with
    RE-PUBLISHES of already-seen ones (identical bytes, higher lsn)."""
    rng = np.random.default_rng(123)
    base_dir = os.path.join(root, "base")
    os.makedirs(base_dir, exist_ok=True)
    base_ids = np.arange(N_BASE, dtype=np.int64)
    pq.write_table(
        _rows(base_ids, np.zeros(N_BASE, dtype=np.int64), None),
        os.path.join(base_dir, "chunk-00000.parquet"),
    )
    events_dir = os.path.join(root, "events")
    lsn, next_id = 1, N_BASE
    for e in range(N_EPOCHS):
        n_new = EVENTS_PER_EPOCH // 3
        new_ids = np.arange(next_id, next_id + n_new, dtype=np.int64)
        next_id += n_new
        repub = rng.integers(0, next_id, EVENTS_PER_EPOCH - n_new).astype(np.int64)
        ids = np.concatenate([new_ids, repub])
        rng.shuffle(ids)
        lsns = np.arange(lsn, lsn + len(ids), dtype=np.int64)
        lsn += len(ids)
        edir = os.path.join(events_dir, f"epoch={e}")
        os.makedirs(edir, exist_ok=True)
        pq.write_table(_rows(ids, lsns, e), os.path.join(edir, "chunk-00000.parquet"))
    return base_dir, events_dir


def _oracle(base_dir: str, events_dir: str) -> pd.DataFrame:
    dfs = [pq.read_table(os.path.join(base_dir, "chunk-00000.parquet")).to_pandas()]
    for name in sorted(os.listdir(events_dir)):
        f = os.path.join(events_dir, name, "chunk-00000.parquet")
        dfs.append(pq.read_table(f).to_pandas().drop(columns=["epoch", "op"]))
    df = pd.concat(dfs, ignore_index=True)
    df = df.sort_values(["content_hash", "lsn"], kind="stable")
    df = df.drop_duplicates(["content_hash"], keep="first")  # FIRST writer wins
    return df.sort_values(["content_hash"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def content_log(tmp_path_factory) -> tuple[str, str]:
    root = str(tmp_path_factory.mktemp("content"))
    return _content_fixture(root)


def test_content_first_writer_wins(ray_session, content_log, lake_dir):
    base_dir, events_dir = content_log
    bootstrap(base_dir, lake_dir, P, merge_spec=CONTENT_SPEC)
    assert Manifest(lake_dir).merge_spec == CONTENT_SPEC
    apply_log(events_dir, lake_dir)

    got = snapshot_table(lake_dir).to_pandas().reset_index(drop=True)
    want = _oracle(base_dir, events_dir)
    cols = ["content_hash", "blob", "first_epoch", "lsn"]
    pd.testing.assert_frame_equal(got[cols], want[cols])
    # content addressing holds: every stored blob hashes to its key
    assert all(_hash(b) == h for h, b in zip(got["content_hash"], got["blob"]))
    # re-publishes never advanced the stored lsn: each key keeps the
    # FIRST lsn it was ever seen with
    assert got["lsn"].min() == 0

    # compaction + resume unchanged
    compact(lake_dir)
    got2 = snapshot_table(lake_dir).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got2[cols], want[cols])


def test_content_identical_republish_is_noop_through_the_loop(
    ray_session, content_log, tmp_path
):
    """The computors contract end to end: an epoch consisting ONLY of
    re-publishes (identical bytes, fresh lsns) changes nothing — the
    changefeed for it is EMPTY, publish emits zero rows, and a replica
    applies zero events."""
    from go_data_publisher_ray.pipelines.publish import publish_changefeed, replicate
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_diff
    from go_data_publisher_ray.pipelines.verify import tables_equal

    base_dir, events_dir = content_log
    src = str(tmp_path / "src")
    bootstrap(base_dir, src, P, merge_spec=CONTENT_SPEC)
    apply_log(events_dir, src)

    # stage a pure re-publish epoch: every already-known identity again
    staged = str(tmp_path / "staged")
    import shutil

    shutil.copytree(events_dir, staged)
    known = snapshot_table(src)
    n = known.num_rows
    repub_ids = np.arange(n, dtype=np.int64)  # ids 0..n-1 all exist
    e = N_EPOCHS
    edir = os.path.join(staged, f"epoch={e}")
    os.makedirs(edir)
    pq.write_table(
        _rows(repub_ids[:N_BASE], np.arange(10_000, 10_000 + N_BASE, dtype=np.int64), e),
        os.path.join(edir, "chunk-00000.parquet"),
    )
    before = snapshot_table(src)
    res = apply_log(staged, src)
    assert any(r.get("epoch") == e and not r.get("skipped") for r in res)
    after = snapshot_table(src)
    ok, msg = tables_equal(before, after, sort_key="content_hash")
    assert ok, msg  # the lake state is bit-identical

    # the changefeed across the re-publish epoch is EMPTY
    d = snapshot_diff(src, e - 1, e)
    assert sum(t.num_rows for t in d.iter_batches(batch_format="pyarrow")) == 0

    # and the full publish -> replicate loop carries the no-op: the
    # re-publish epoch's feed has zero rows and the replica applies it
    # as an empty fence, ending bit-identical to the source
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")
    out = publish_changefeed(src, feed, value_cols=("blob", "first_epoch"))
    repub_feed = [p for p in out["published"] if p["epoch"] == e]
    assert repub_feed and repub_feed[0]["rows"] == 0
    export_snapshot(src, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=P)
    ok, msg = tables_equal(
        snapshot_table(src), snapshot_table(replica), sort_key="content_hash"
    )
    assert ok, msg


def test_content_duplicate_delivery_and_erase(ray_session, content_log, tmp_path):
    """Exactly-once + administrative erasure on the first_wins entity:
    re-applying a committed epoch is a skip; erase_keys wins the merge
    DOWNWARD and physically removes the identity."""
    from go_data_publisher_ray.pipelines.maintain import erase_keys
    from go_data_publisher_ray.pipelines.snapshot import lookup_keys

    base_dir, events_dir = content_log
    lake = str(tmp_path / "lake")
    bootstrap(base_dir, lake, P, merge_spec=CONTENT_SPEC)
    apply_log(events_dir, lake)
    before = snapshot_table(lake)

    # duplicate delivery: the whole log again, all skipped
    res = apply_log(events_dir, lake)
    assert all(r.get("skipped") for r in res)
    assert snapshot_table(lake).equals(before)

    victim = _hash(_blob(0))
    assert lookup_keys(lake, [victim]).num_rows == 1
    out = erase_keys(lake, [victim])
    assert out["erased"] == 1
    assert lookup_keys(lake, [victim]).num_rows == 0
    hits = []
    for root, _dirs, files in os.walk(lake):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                if victim.encode() in fh.read():
                    hits.append(os.path.join(root, f))
    assert hits == []


def test_content_verify_surfaces(ray_session, content_log, lake_dir):
    """Review r4 (3rd pass): both verify oracles must honor first_wins —
    the pandas replay (drop_duplicates keep-first) and the distributed
    audit's keep_last_by direction — or a correct content lake would
    read as mismatched."""
    from go_data_publisher_ray.pipelines.verify import (
        replay_oracle_table,
        tables_equal,
        verify_partitions,
    )

    base_dir, events_dir = content_log
    bootstrap(base_dir, lake_dir, P, merge_spec=CONTENT_SPEC)
    apply_log(events_dir, lake_dir)

    want = replay_oracle_table(base_dir, events_dir, spec=CONTENT_SPEC)
    ok, msg = tables_equal(
        snapshot_table(lake_dir), want, sort_key="content_hash"
    )
    assert ok, msg

    report = verify_partitions(lake_dir, base_dir, events_dir)
    assert report["mismatched_partitions"] == []
    assert report["partitions_checked"] == P
