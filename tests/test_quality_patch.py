"""M6 data-quality patch in the ingest path: conditional rewrite of a
known-bad lsn range before the merge shuffle
(`status-service/sync/tick_processor.go:210-214` analog)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal
from go_data_publisher_ray.stages.patch import PatchRule, apply_patch_rules

P = 8


def test_patch_rule_vectorized_unit():
    t = pa.table(
        {"lsn": pa.array([1, 5, 9], pa.int64()), "v": pa.array([0.5, 3.0, 1.0])}
    )
    out = apply_patch_rules(
        t, (PatchRule("lsn", 4, 10, "v", 2.0, valid_min=2.0),), mark=True
    )
    assert out.column("v").to_pylist() == [0.5, 3.0, 2.0]
    assert out.column("patched").to_pylist() == [0, 0, 1]


def test_quality_patch_in_apply_path(ray_session, small_log, lake_dir):
    """Rows in the bad range are rewritten before the merge; the final
    state equals the oracle replay of a post-hoc-patched log."""
    events = os.path.join(small_log, "events")
    rules = (PatchRule("lsn", 2_000, 2_500, "lang", "und"),)
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(events, lake_dir, patch_rules=rules)

    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), events)
    # lang depends only on the row itself, so patching winners post-hoc
    # is equivalent to patching the log pre-merge
    mask = pc.and_(
        pc.greater_equal(want.column("lsn"), 2_000),
        pc.less_equal(want.column("lsn"), 2_500),
    )
    lang = pc.if_else(mask, pa.scalar("und"), want.column("lang"))
    idx = want.schema.get_field_index("lang")
    want = want.set_column(idx, want.schema.field(idx), lang)

    ok, msg = tables_equal(got, want)
    assert ok, msg
    n_patched = pc.sum(pc.cast(mask, pa.int64())).as_py()
    assert (got.column("lang").to_pandas() == "und").sum() >= min(1, n_patched)
