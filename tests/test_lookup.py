"""Point-lookup read path (S7 search-by-key analog): pushdown-filtered
partition reads, LWW-correct, tombstone-aware, time-travel-capable."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import lookup_keys, snapshot_table

P = 8


def test_lookup_matches_snapshot(ray_session, small_log, lake_dir):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir)
    full = snapshot_table(lake_dir).sort_by("url")
    urls = full.column("url").to_pylist()
    live = [urls[0], urls[len(urls) // 2], urls[-1]]

    got = lookup_keys(lake_dir, live + ["url-that-never-existed"])
    assert got.num_rows == 3
    got = got.sort_by("url")
    import pyarrow as pa

    want = full.filter(
        pc.is_in(full.column("url"), value_set=pa.array(live))
    ).sort_by("url")
    assert got.equals(want.select(got.schema.names).cast(got.schema))

    # a deleted url (in base, tombstoned later) returns no row
    base_urls = set()
    import pyarrow.parquet as pq

    for f in os.listdir(base):
        if f.endswith(".parquet"):
            base_urls.update(pq.read_table(os.path.join(base, f), columns=["url"])
                             .column("url").to_pylist())
    deleted = sorted(base_urls - set(urls))
    assert deleted, "fixture should tombstone at least one base url"
    assert lookup_keys(lake_dir, [deleted[0]]).num_rows == 0


def test_lookup_time_travel(ray_session, small_log, lake_dir):
    base, events = os.path.join(small_log, "base"), os.path.join(small_log, "events")
    bootstrap(base, lake_dir, P)
    apply_log(events, lake_dir, stop_after=2)
    asof = snapshot_table(lake_dir)
    apply_log(events, lake_dir)
    now = snapshot_table(lake_dir)

    # pick a url whose row changed between epoch 1 and the end
    a = {r["url"]: r["lsn"] for r in asof.select(["url", "lsn"]).to_pylist()}
    n = {r["url"]: r["lsn"] for r in now.select(["url", "lsn"]).to_pylist()}
    changed = sorted(u for u in a if u in n and a[u] != n[u])
    assert changed
    u = changed[0]
    old = lookup_keys(lake_dir, [u], upto_epoch=1)
    new = lookup_keys(lake_dir, [u])
    assert old.column("lsn").to_pylist() == [a[u]]
    assert new.column("lsn").to_pylist() == [n[u]]

    with pytest.raises(ValueError, match="not committed"):
        lookup_keys(lake_dir, [u], upto_epoch=999)
