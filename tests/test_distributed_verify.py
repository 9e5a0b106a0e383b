"""Distributed replay verifier: clean lake verifies; injected corruption
is detected, attributed to the right partition, and dead-lettered
(skip-and-record) rather than failing the job."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.verify import verify_partitions
from go_data_publisher_ray.state.manifest import Manifest

P = 8


import pytest


@pytest.mark.parametrize("payload_mode", ["hash", "full"])
def test_verify_clean_lake(ray_session, small_log, lake_dir, payload_mode):
    """Both modes verify a clean lake: "hash" (default) exchanges only
    keys + orders + a per-row payload md5 (scale-correct — the shuffle
    stays light no matter how the epoch compares to the object store);
    "full" keeps literal full-column equality for small-scale debugging."""
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(os.path.join(small_log, "events"), lake_dir)
    report = verify_partitions(
        lake_dir,
        os.path.join(small_log, "base"),
        os.path.join(small_log, "events"),
        payload_mode=payload_mode,
    )
    assert report["partitions_checked"] == P
    assert report["mismatched_partitions"] == []
    assert report["verified_rows"] > 0
    assert not os.path.isdir(os.path.join(lake_dir, "deadletter"))


def test_verify_detects_corruption(ray_session, small_log, lake_dir):
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(os.path.join(small_log, "events"), lake_dir)

    # corrupt a WINNING row in partition 3: a non-delete row in the
    # highest-epoch delta (later epochs always win LWW, so the merged
    # view must change)
    man = Manifest(lake_dir)
    _base, deltas = man.load_state().live_files(3)
    victim = os.path.join(lake_dir, deltas[-1].path)
    t = pq.read_table(victim)
    ops = t.column("op").to_pylist()
    idx = next(i for i, op in enumerate(ops) if op != "delete")
    texts = t.column("text").to_pylist()
    texts[idx] = "CORRUPTED"
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts))
    pq.write_table(t, victim, compression="zstd")

    report = verify_partitions(
        lake_dir, os.path.join(small_log, "base"), os.path.join(small_log, "events")
    )
    assert report["mismatched_partitions"] == [3]
    dl_dir = os.path.join(lake_dir, "deadletter")
    files = os.listdir(dl_dir)
    assert len(files) == 1
    rec = json.load(open(os.path.join(dl_dir, files[0])))
    assert rec["mismatched_partitions"] == [3]
