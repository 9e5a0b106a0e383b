"""Sub-epoch backlog bound (the MaxPollRecords analog,
`transactions-consumer/main.go:56`): an oversized catch-up epoch is
applied in file-granular slices — each slice its own bounded Ray pass
writing delta_{epoch}_sNNN files — with ONE manifest commit.  The LWW
kernels are associative (unique lsn tie-breaker), so slice boundaries
must not change the merged state, compaction, or time travel."""

from __future__ import annotations

import os

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import tables_equal
from go_data_publisher_ray.sources.generator import LogSpec, cached_fixture
from go_data_publisher_ray.state.manifest import Manifest

# several chunk files per epoch so the file-granular slicer has cuts
SLICE_SPEC = LogSpec(
    n_base=1_000, n_sites=20, n_events=4_000, epoch_size=2_000,
    chunk_size=500, html_min=16, html_max=32, text_pad=16,
)
P = 8


def test_sliced_epoch_matches_unsliced(ray_session, tmp_path):
    log = cached_fixture(SLICE_SPEC)
    base, events = os.path.join(log, "base"), os.path.join(log, "events")
    n_files = len(
        [f for f in os.listdir(os.path.join(events, "epoch=0")) if f.endswith(".parquet")]
    )
    assert n_files > 1  # otherwise the fixture can't exercise slicing

    plain, sliced = str(tmp_path / "plain"), str(tmp_path / "sliced")
    bootstrap(base, plain, P)
    apply_log(events, plain)
    bootstrap(base, sliced, P)
    # slice_bytes=1: every source file becomes its own slice (maximum
    # fragmentation — the worst case for cross-slice LWW collapse)
    res = apply_log(events, sliced, slice_bytes=1)
    assert all(not r.get("skipped") for r in res)

    man = Manifest(sliced)
    rec = man.epoch_record(0)
    assert rec["metrics"]["slices"] == n_files
    # several delta files per partition under the ONE epoch record
    per_part: dict[int, int] = {}
    for fd in rec["files"]:
        per_part[fd["partition"]] = per_part.get(fd["partition"], 0) + 1
    assert max(per_part.values()) > 1

    ok, msg = tables_equal(snapshot_table(plain), snapshot_table(sliced))
    assert ok, msg

    # time travel mid-log agrees too (slice files serve as-of reads)
    ok, msg = tables_equal(
        snapshot_table(plain, upto_epoch=0), snapshot_table(sliced, upto_epoch=0)
    )
    assert ok, msg

    # compaction folds the slice files like any other deltas
    compact(plain)
    compact(sliced)
    ok, msg = tables_equal(snapshot_table(plain), snapshot_table(sliced))
    assert ok, msg


def test_slice_bound_noop_on_small_epochs(ray_session, small_log, tmp_path):
    """A bound larger than every epoch leaves behavior (and delta file
    names) byte-identical to the unbounded path."""
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    lake = str(tmp_path / "lake")
    bootstrap(base, lake, P)
    apply_log(events, lake, slice_bytes=1 << 40)
    man = Manifest(lake)
    for e in man.committed_epochs():
        rec = man.epoch_record(e)
        assert "slices" not in rec["metrics"]
        assert all("_s" not in os.path.basename(f["path"]) for f in rec["files"])


def test_sliced_poisoned_partition_excluded_entirely(ray_session, tmp_path):
    """Review r4 #2: a partition deadlettered in ANY slice is excluded
    from the epoch commit entirely (no half-applied partition), and the
    deadletter record appears once, not once per failed slice."""
    from go_data_publisher_ray.pipelines.apply import apply_epoch, bootstrap

    log = cached_fixture(SLICE_SPEC)
    base, events = os.path.join(log, "base"), os.path.join(log, "events")
    lake = str(tmp_path / "lake")
    bootstrap(base, lake, P)
    out = apply_epoch(
        events, lake, 0, slice_bytes=1, fault={"poison_parts": (3,)}
    )
    assert out["deadletter_parts"] == [3]
    rec = Manifest(lake).epoch_record(0)
    assert rec["metrics"]["deadletter_parts"] == [3]
    assert all(f["partition"] != 3 for f in rec["files"])
    # healthy partitions committed multiple slice files
    per_part: dict[int, int] = {}
    for fd in rec["files"]:
        per_part[fd["partition"]] = per_part.get(fd["partition"], 0) + 1
    assert max(per_part.values()) > 1


def test_slice_bytes_auto_resolution(ray_session):
    """GDP_SLICE_BYTES=auto derives the backlog bound from the live
    object store (a quarter of capacity, the bench_backlog-validated
    ratio); explicit ints pass through; junk raises."""
    import ray

    from go_data_publisher_ray.pipelines.apply import _resolve_slice_bytes

    assert _resolve_slice_bytes(None) is None
    assert _resolve_slice_bytes(0) is None
    assert _resolve_slice_bytes("1048576") == 1 << 20
    assert _resolve_slice_bytes(123) == 123
    auto = _resolve_slice_bytes("auto")
    store = ray.cluster_resources().get("object_store_memory", 0)
    assert auto == int(store // 4) > 0
    import pytest

    with pytest.raises(ValueError):
        _resolve_slice_bytes("garbage")
