"""Malformed-record tolerance (M3 analog): events with null key/order
fields are rejected at the normalize stage instead of crashing or
corrupting the merge; the valid rows still apply exactly."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import tables_equal

P = 4


def _events_table(urls, lsns, ops=None):
    n = len(urls)
    return pa.table(
        {
            "lsn": pa.array(lsns, type=pa.int64()),
            "epoch": pa.array([0] * n, type=pa.int32()),
            "op": pa.array(ops or ["update"] * n),
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(
                [1000 + (l or 0) for l in lsns], type=pa.timestamp("us")
            ),
            "html": pa.array([b"h"] * n, type=pa.binary()),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
        }
    )


def test_null_keys_dropped(ray_session, tmp_path):
    base_dir = str(tmp_path / "base")
    events_dir = str(tmp_path / "events")
    os.makedirs(base_dir)
    edir = os.path.join(events_dir, "epoch=0")
    os.makedirs(edir)

    base = _events_table([f"u{i}" for i in range(10)], list(range(10))).drop_columns(
        ["epoch", "op"]
    )
    pq.write_table(base, os.path.join(base_dir, "chunk-0.parquet"))

    good_urls = [f"u{i}" for i in range(5)]
    urls = good_urls + [None, None]
    lsns = [11, 12, 13, 14, 15, 16, None]
    dirty = _events_table(urls, lsns)
    pq.write_table(dirty, os.path.join(edir, "chunk-0.parquet"))

    lake = str(tmp_path / "lake")
    bootstrap(base_dir, lake, P)
    results = apply_log(events_dir, lake)
    assert all(not r.get("skipped") for r in results)

    clean_dir = str(tmp_path / "clean_events")
    cdir = os.path.join(clean_dir, "epoch=0")
    os.makedirs(cdir)
    pq.write_table(
        _events_table(good_urls, [11, 12, 13, 14, 15]),
        os.path.join(cdir, "chunk-0.parquet"),
    )
    clean_lake = str(tmp_path / "clean_lake")
    bootstrap(base_dir, clean_lake, P)
    apply_log(clean_dir, clean_lake)

    got, want = snapshot_table(lake), snapshot_table(clean_lake)
    # text column differs per construction index; compare keys and counts
    assert got.num_rows == want.num_rows
    assert got.column("url").equals(want.column("url"))
    assert got.column("lsn").equals(want.column("lsn"))
