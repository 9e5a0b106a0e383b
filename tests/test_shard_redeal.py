"""Shard re-deal (grow the fleet n -> 2n): split_shard children own the
parent's key space exactly, resume the same change log from the same
watermark, and the grown fleet's union equals the unsharded table —
the file-based analog of Kafka consumer-group rebalance when consumers
are added (`transactions-consumer/main.go:94-102`)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.shard import split_shard
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import tables_equal
from go_data_publisher_ray.state.manifest import Manifest

P = 8


def _sorted_union(lakes: list[str]) -> pa.Table:
    t = pa.concat_tables([snapshot_table(c) for c in lakes])
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def test_split_fleet_union_equals_full(ray_session, small_log, tmp_path):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    full = str(tmp_path / "full")
    bootstrap(base, full, P)
    apply_log(events, full)
    want = snapshot_table(full)

    # a 2-shard fleet ingests half the log...
    fleet = []
    for k in (0, 1):
        lk = str(tmp_path / f"s{k}")
        bootstrap(base, lk, P, shard=(k, 2))
        apply_log(events, lk, shard=(k, 2), stop_after=5)
        fleet.append(lk)

    # ...then grows to 4 by splitting each shard lake in place
    children = []
    for k, lk in enumerate(fleet):
        a, b = str(tmp_path / f"c{k}"), str(tmp_path / f"c{k + 2}")
        out = split_shard(lk, a, b)
        assert set(out["children"]) == {f"{k}/4", f"{k + 2}/4"}
        assert all(c["partitions"] > 0 for c in out["children"].values())
        children += [a, b]

    # every child resumes the SAME log: ingested epochs skip as
    # committed (carried manifest records), the rest apply under the
    # child's own shard (read back from lake.json, no flag needed)
    for c in children:
        res = apply_log(events, c)
        assert [r["epoch"] for r in res if r.get("skipped")] == [0, 1, 2, 3, 4]
        assert [r["epoch"] for r in res if not r.get("skipped")] == [5, 6, 7, 8, 9]

    ok, msg = tables_equal(_sorted_union(children), want)
    assert ok, msg
    # children are real disjoint slices, not copies
    sizes = [snapshot_table(c).num_rows for c in children]
    assert sum(sizes) == want.num_rows and all(0 < s < want.num_rows for s in sizes)


def test_split_unsharded_lake(ray_session, small_log, tmp_path):
    """An unsharded lake is shard 0/1: one split yields the 2-fleet."""
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    full = str(tmp_path / "full")
    bootstrap(base, full, P)
    apply_log(events, full)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    out = split_shard(full, a, b)
    assert out["from"] == "0/1" and set(out["children"]) == {"0/2", "1/2"}
    assert Manifest(a).shard == (0, 2) and Manifest(b).shard == (1, 2)
    ok, msg = tables_equal(_sorted_union([a, b]), snapshot_table(full))
    assert ok, msg


def test_split_sweeps_crashed_staging_dirs(ray_session, small_log, tmp_path):
    """A hard-killed prior split (SIGKILL: the except-cleanup never ran)
    leaves a pid-suffixed staging dir holding a full hardlink/copy of
    the child; the retry — a NEW pid — must sweep it, or erased-key
    bytes and disk stay leaked forever (r5 review finding)."""
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    full = str(tmp_path / "full")
    bootstrap(base, full, P)
    apply_log(events, full, stop_after=2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # fake the crash leftover under a foreign pid
    stale = a + ".split-tmp-99999"
    os.makedirs(os.path.join(stale, "manifest"))
    with open(os.path.join(stale, "lake.json"), "w") as f:
        f.write("{}")
    out = split_shard(full, a, b)
    assert set(out["children"]) == {"0/2", "1/2"}
    assert not os.path.exists(stale)
    leftovers = [n for n in os.listdir(tmp_path) if ".split-tmp-" in n]
    assert leftovers == []
    ok, msg = tables_equal(_sorted_union([a, b]), snapshot_table(full))
    assert ok, msg


def test_split_carries_admin_epochs_and_refuses_overgrow(
    ray_session, small_log, tmp_path
):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    from go_data_publisher_ray.pipelines.maintain import erase_keys

    full = str(tmp_path / "full")
    bootstrap(base, full, P)
    apply_log(events, full)
    victim = snapshot_table(full).column("url")[0].as_py()
    out = erase_keys(full, [victim])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    split_shard(full, a, b)
    assert Manifest(a).admin_epochs == {out["epoch"]}
    assert Manifest(b).admin_epochs == {out["epoch"]}

    # splitting beyond the partition count would leave empty children
    tiny = str(tmp_path / "tiny")
    bootstrap(base, tiny, 2)
    c, d = str(tmp_path / "c"), str(tmp_path / "d")
    split_shard(tiny, c, d)
    with pytest.raises(ValueError, match="exceed"):
        split_shard(c, str(tmp_path / "e"), str(tmp_path / "f"))


def test_shard_validation_and_unsharded_refusal(ray_session, small_log, tmp_path):
    """Review r4 (2nd pass): shard strings are validated (a 1-indexed
    2/2 owns nothing and would silently drop every row), and an explicit
    shard against an EXISTING unsharded lake is refused instead of
    silently filtering the full key space."""
    from go_data_publisher_ray.pipelines.apply import parse_shard

    assert parse_shard("1/2") == (1, 2)
    for bad in ("2/2", "3/2", "-1/2", "0", "0/2/4"):
        with pytest.raises(ValueError):
            parse_shard(bad)

    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    lake = str(tmp_path / "lake")
    bootstrap(base, lake, P)  # unsharded
    with pytest.raises(ValueError, match="unsharded"):
        apply_log(events, lake, shard=(0, 2))
    with pytest.raises(ValueError, match="unsharded"):
        bootstrap(base, lake, P, shard=(0, 2))  # skip-path must refuse too
