"""Second lake entity: processed tick-intervals through the SAME
manifest/delta/compaction machinery, with the reference's monotone
merge — keep max(to) per (epoch_id, from)
(`tick-intervals-consumer/consume/intervals_processor.go:103-149`).
Proves the engine generalizes beyond the pages entity (MergeSpec)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.schema import INTERVALS_SPEC
from go_data_publisher_ray.state.manifest import Manifest

P = 4
N_EPOCHS = 6
EVENTS_PER_EPOCH = 400
N_GROUPS = 50  # distinct epoch_id values (the partition key)


def _intervals_fixture(root: str) -> tuple[str, str]:
    """Deterministic interval change log: base rows then per-epoch
    updates that grow (or try to shrink) each interval's `to`."""
    rng = np.random.default_rng(77)
    base_dir = os.path.join(root, "base")
    os.makedirs(base_dir, exist_ok=True)
    eid = np.arange(N_GROUPS, dtype=np.int64)
    base = pa.table(
        {
            "epoch_id": eid,
            "from_lsn": eid * 1000,
            "to_lsn": eid * 1000 + rng.integers(1, 50, N_GROUPS),
            "lsn": np.zeros(N_GROUPS, dtype=np.int64),
        }
    )
    pq.write_table(base, os.path.join(base_dir, "chunk-00000.parquet"))

    events_dir = os.path.join(root, "events")
    lsn = 1
    for e in range(N_EPOCHS):
        g = rng.integers(0, N_GROUPS, EVENTS_PER_EPOCH).astype(np.int64)
        lsns = np.arange(lsn, lsn + EVENTS_PER_EPOCH, dtype=np.int64)
        lsn += EVENTS_PER_EPOCH
        t = pa.table(
            {
                "epoch_id": g,
                "from_lsn": g * 1000,
                # mix of growth and stale (smaller) `to` values: the
                # monotone merge must keep the max regardless of order
                "to_lsn": g * 1000 + rng.integers(1, 500, EVENTS_PER_EPOCH),
                "lsn": lsns,
                "epoch": np.full(EVENTS_PER_EPOCH, e, dtype=np.int32),
            }
        )
        edir = os.path.join(events_dir, f"epoch={e}")
        os.makedirs(edir, exist_ok=True)
        pq.write_table(t, os.path.join(edir, "chunk-00000.parquet"))
    return base_dir, events_dir


def _oracle(base_dir: str, events_dir: str) -> pd.DataFrame:
    dfs = [pq.read_table(os.path.join(base_dir, "chunk-00000.parquet")).to_pandas()]
    for name in sorted(os.listdir(events_dir)):
        f = os.path.join(events_dir, name, "chunk-00000.parquet")
        dfs.append(pq.read_table(f).to_pandas().drop(columns=["epoch"]))
    df = pd.concat(dfs, ignore_index=True)
    df = df.sort_values(["epoch_id", "from_lsn", "to_lsn", "lsn"], kind="stable")
    df = df.drop_duplicates(["epoch_id", "from_lsn"], keep="last")
    return df.sort_values(["epoch_id", "from_lsn"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def intervals_log(tmp_path_factory) -> tuple[str, str]:
    root = str(tmp_path_factory.mktemp("intervals"))
    return _intervals_fixture(root)


def test_intervals_apply_matches_monotone_merge(ray_session, intervals_log, lake_dir):
    base_dir, events_dir = intervals_log
    bootstrap(base_dir, lake_dir, P, merge_spec=INTERVALS_SPEC)
    assert Manifest(lake_dir).merge_spec == INTERVALS_SPEC
    apply_log(events_dir, lake_dir)

    got = snapshot_table(lake_dir).to_pandas().reset_index(drop=True)
    want = _oracle(base_dir, events_dir)
    pd.testing.assert_frame_equal(
        got[["epoch_id", "from_lsn", "to_lsn", "lsn"]],
        want[["epoch_id", "from_lsn", "to_lsn", "lsn"]],
    )
    # monotonicity: every merged `to` is the max ever seen for its key
    assert (got["to_lsn"].values >= got["from_lsn"].values).all()


def test_intervals_distributed_verify(ray_session, intervals_log, lake_dir):
    """ADVICE r2: verify_partitions must read the entity's MergeSpec from
    the manifest (key/order/partition columns, no tombstones) instead of
    hardcoding pages semantics — pre-fix this raised KeyError('url')."""
    from go_data_publisher_ray.pipelines.verify import verify_partitions

    base_dir, events_dir = intervals_log
    bootstrap(base_dir, lake_dir, P, merge_spec=INTERVALS_SPEC)
    apply_log(events_dir, lake_dir)
    report = verify_partitions(lake_dir, base_dir, events_dir)
    assert report["mismatched_partitions"] == []
    assert report["partitions_checked"] == P
    assert report["verified_rows"] == N_GROUPS


def test_intervals_cli_roundtrip(intervals_log, tmp_path):
    """VERDICT r2 #7: the second entity through the full driver surface —
    bootstrap --entity intervals, tail, status, verify (replay + the
    distributed audit) via the module CLI, fresh process per command as
    `ray job submit` would run it."""
    import json
    import subprocess
    import sys

    base_dir, events_dir = intervals_log
    env = dict(os.environ, RAY_ADDRESS="local")
    lake = str(tmp_path / "ilake")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "go_data_publisher_ray.cli", "--num-cpus", "4", *args],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run(
        "bootstrap", "--base", base_dir, "--lake", lake,
        "--partitions", str(P), "--entity", "intervals",
    )
    out = run(
        "tail", "--events", events_dir, "--lake", lake,
        "--poll", "0.05", "--max-idle", "2",
    )
    assert len([r for r in out if not r.get("skipped")]) == N_EPOCHS
    st = run("status", "--lake", lake)
    assert st["last_committed_epoch"] == N_EPOCHS - 1 and st["gaps"] == []
    ver = run("verify", "--lake", lake, "--base", base_dir, "--events", events_dir)
    assert ver["replay_equivalent"] is True, ver["replay_detail"]
    ver2 = run(
        "verify", "--lake", lake, "--base", base_dir, "--events", events_dir,
        "--distributed",
    )
    assert ver2["replay_audit"]["mismatched_partitions"] == []


def test_intervals_compaction_and_resume(ray_session, intervals_log, lake_dir):
    base_dir, events_dir = intervals_log
    bootstrap(base_dir, lake_dir, P, merge_spec=INTERVALS_SPEC)
    apply_log(events_dir, lake_dir, stop_after=3)
    compact(lake_dir)
    # resume skips committed epochs, applies the rest, merges over the
    # compacted base
    results = apply_log(events_dir, lake_dir)
    assert sum(1 for r in results if r.get("skipped")) == 3
    got = snapshot_table(lake_dir).to_pandas().reset_index(drop=True)
    want = _oracle(base_dir, events_dir)
    pd.testing.assert_frame_equal(
        got[["epoch_id", "from_lsn", "to_lsn", "lsn"]],
        want[["epoch_id", "from_lsn", "to_lsn", "lsn"]],
    )


def test_intervals_changefeed_composite_key(ray_session, intervals_log, lake_dir):
    """snapshot_diff on the second entity: composite (epoch_id, from_lsn)
    key exercises the \\x1f-joined key path of the differ, and the
    no-tombstone monotone merge means every change is 'changed' with a
    strictly grown order tuple (to_lsn, lsn)."""
    from go_data_publisher_ray.pipelines.snapshot import snapshot_diff

    base_dir, events_dir = intervals_log
    bootstrap(base_dir, lake_dir, P, merge_spec=INTERVALS_SPEC)
    apply_log(events_dir, lake_dir)

    e1, e2 = 2, N_EPOCHS - 1
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in snapshot_diff(lake_dir, e1, e2).iter_batches(batch_format="pyarrow")
    ]
    got = pa.concat_tables([t for t in tables if t.num_rows]).to_pandas()
    got = got.sort_values(["epoch_id", "from_lsn"]).reset_index(drop=True)

    old = snapshot_table(lake_dir, upto_epoch=e1).to_pandas()
    new = snapshot_table(lake_dir, upto_epoch=e2).to_pandas()
    m = old.merge(new, on=["epoch_id", "from_lsn"], suffixes=("_a", "_b"))
    want = m[(m.to_lsn_a != m.to_lsn_b) | (m.lsn_a != m.lsn_b)]

    # base seeds every key, intervals never delete -> pure 'changed' feed
    assert set(got["change"]) == {"changed"}
    assert len(got) == len(want)
    assert (got["new_to_lsn"].values >= got["old_to_lsn"].values).all()
    want_keys = set(zip(want.epoch_id, want.from_lsn))
    assert set(zip(got.epoch_id, got.from_lsn)) == want_keys


def test_intervals_maintenance_surfaces(ray_session, intervals_log, tmp_path):
    """The round-3 surfaces are spec-generic: lookup by the partition
    key prefix, repartition, vacuum — and erasure is refused for an
    entity without tombstone semantics."""
    from go_data_publisher_ray.pipelines.maintain import (
        erase_keys,
        repartition_lake,
        vacuum,
    )
    from go_data_publisher_ray.pipelines.snapshot import lookup_keys

    base_dir, events_dir = intervals_log
    src = str(tmp_path / "src")
    bootstrap(base_dir, src, P, merge_spec=INTERVALS_SPEC)
    apply_log(events_dir, src)
    full = snapshot_table(src)

    # point lookup by epoch_id (the key prefix = partition column):
    # returns every interval of that group, merged
    got = lookup_keys(src, [7, 21])
    want = full.filter(
        pa.compute.is_in(full.column("epoch_id"), value_set=pa.array([7, 21]))
    )
    assert got.sort_by("from_lsn").equals(
        want.sort_by("from_lsn").select(got.schema.names).cast(got.schema)
    )

    # repartition to 3x, same merged state, resumes the log
    dst = str(tmp_path / "dst")
    r = repartition_lake(src, dst, 3 * P)
    assert r["partitions"] <= 3 * P  # empty partitions write no base
    a = snapshot_table(src).sort_by([("epoch_id", "ascending"), ("from_lsn", "ascending")])
    b = snapshot_table(dst).sort_by([("epoch_id", "ascending"), ("from_lsn", "ascending")])
    assert a.equals(b.select(a.schema.names).cast(a.schema))

    # compaction + vacuum leave the view intact
    compact(src)
    assert vacuum(src)["files_deleted"] > 0
    c = snapshot_table(src).sort_by([("epoch_id", "ascending"), ("from_lsn", "ascending")])
    assert a.equals(c.select(a.schema.names).cast(a.schema))

    # no tombstones -> erasure is undefined and refused loudly
    with pytest.raises(ValueError, match="tombstone"):
        erase_keys(src, [7])
