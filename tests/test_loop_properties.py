"""Property-based test of the COMPLETE loop over randomized change
logs: generate a random (seeded) log with duplicates / deletes / ties /
skew, run source-apply -> publish -> replicate, and require BOTH the
source and the replica to equal the independent replay oracle.

This composes every effectively-once mechanism at once (idempotent
delta writes, manifest commits, per-epoch diffs, tombstone lsn-bump
reconstruction) under inputs no hand-written fixture picked — the
whole-system analog of test_lww_properties' kernel checks."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.publish import publish_changefeed, replicate
from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal
from go_data_publisher_ray.sources.generator import LogSpec, cached_fixture

VALUE_COLS = ("text", "lang", "html")


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    delete_frac=st.sampled_from([0.0, 0.1, 0.3]),
    dup_every=st.sampled_from([0, 7]),
    tie_group=st.sampled_from([1, 8]),
    slice_bytes=st.sampled_from([None, 1]),
)
def test_full_loop_matches_replay_oracle(
    ray_session, tmp_path_factory, seed, delete_frac, dup_every, tie_group, slice_bytes
):
    # slice_bytes=1 applies every source file as its own sub-epoch slice
    # (multiple delta files per epoch per partition) — the backlog bound
    # must be invisible to the replay oracle AND to the publish ->
    # replicate loop (diffs are as-of views over the slice files)
    spec = LogSpec(
        seed=seed,
        n_base=400,
        n_sites=10,
        n_events=1_600,
        epoch_size=400,
        chunk_size=200,
        delete_frac=delete_frac,
        dup_every=dup_every,
        tie_group=tie_group,
        html_min=8,
        html_max=24,
        text_pad=12,
    )
    log = cached_fixture(spec)
    root = str(tmp_path_factory.mktemp(f"loop{seed}"))
    src = os.path.join(root, "src")
    feed = os.path.join(root, "feed")
    boot = os.path.join(root, "boot")
    replica = os.path.join(root, "replica")

    base, events = os.path.join(log, "base"), os.path.join(log, "events")
    bootstrap(base, src, 4)
    apply_log(events, src, slice_bytes=slice_bytes)
    want = replay_oracle_table(base, events)
    ok, msg = tables_equal(snapshot_table(src), want)
    assert ok, f"source vs oracle: {msg}"

    out = publish_changefeed(src, feed, value_cols=VALUE_COLS)
    export_snapshot(src, boot, upto_epoch=out["bootstrap_epoch"])
    replicate(feed, replica, bootstrap_dir=boot, num_partitions=2)
    ok, msg = tables_equal(snapshot_table(replica), want)
    assert ok, f"replica vs oracle (seed={seed}): {msg}"
