"""Changefeed between committed table versions: ``snapshot_diff(lake,
E1, E2)`` must classify exactly the keys whose merged state changed —
added / changed / deleted with both sides' order tuples — and refuse
uncommitted or compaction-folded endpoints.  Cross-checked against a
driver-side diff of the two ``snapshot_table`` time-travel views (which
themselves are replay-verified in test_time_travel.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import (
    snapshot_diff,
    snapshot_table,
)
from go_data_publisher_ray.sources.generator import cached_fixture

from conftest import SMALL_SPEC

P = 8


def _build(tmp_path) -> str:
    log = cached_fixture(SMALL_SPEC)
    lake = str(tmp_path / "lake")
    bootstrap(os.path.join(log, "base"), lake, P)
    apply_log(os.path.join(log, "events"), lake)
    return lake


def _diff_table(lake: str, e1: int, e2: int) -> pa.Table:
    ds = snapshot_diff(lake, e1, e2)
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    tables = [t for t in tables if t.num_rows]
    t = pa.concat_tables(tables)
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def _expected(lake: str, e1: int, e2: int) -> pa.Table:
    old = snapshot_table(lake, upto_epoch=e1)
    new = snapshot_table(lake, upto_epoch=e2)
    o = {
        u: (ts, lsn)
        for u, ts, lsn in zip(
            old.column("url").to_pylist(),
            old.column("warc_ts").to_pylist(),
            old.column("lsn").to_pylist(),
        )
    }
    n = {
        u: (ts, lsn)
        for u, ts, lsn in zip(
            new.column("url").to_pylist(),
            new.column("warc_ts").to_pylist(),
            new.column("lsn").to_pylist(),
        )
    }
    rows = []
    for u in sorted(set(o) | set(n)):
        if u not in o:
            rows.append((u, "added", None, None, *n[u]))
        elif u not in n:
            rows.append((u, "deleted", *o[u], None, None))
        elif o[u] != n[u]:
            rows.append((u, "changed", *o[u], *n[u]))
    cols = list(zip(*rows)) if rows else [[]] * 6
    return pa.table(
        {
            "url": pa.array(cols[0], pa.string()),
            "change": pa.array(cols[1], pa.string()),
            "old_warc_ts": pa.array(cols[2], pa.timestamp("us")),
            "old_lsn": pa.array(cols[3], pa.int64()),
            "new_warc_ts": pa.array(cols[4], pa.timestamp("us")),
            "new_lsn": pa.array(cols[5], pa.int64()),
        }
    )


def test_diff_matches_view_delta(ray_session, tmp_path):
    lake = _build(tmp_path)
    last = SMALL_SPEC.n_epochs - 1
    for e1, e2 in ((0, last), (1, 3), (last - 1, last)):
        got = _diff_table(lake, e1, e2)
        want = _expected(lake, e1, e2)
        assert got.num_rows == want.num_rows, (e1, e2)
        got = got.select(want.column_names).cast(want.schema)
        assert got.equals(want), f"diff({e1},{e2}) mismatch"
        # every change kind should be exercised somewhere in the sweep


def test_diff_covers_all_change_kinds(ray_session, tmp_path):
    lake = _build(tmp_path)
    got = _diff_table(lake, 0, SMALL_SPEC.n_epochs - 1)
    kinds = set(got.column("change").to_pylist())
    assert kinds == {"added", "changed", "deleted"}


def test_diff_refusals(ray_session, tmp_path):
    lake = _build(tmp_path)
    with pytest.raises(ValueError, match="not committed"):
        snapshot_diff(lake, 0, 10_000)
    with pytest.raises(ValueError, match="precede"):
        snapshot_diff(lake, 2, 2)
    compact(lake, min_deltas=1)
    last = SMALL_SPEC.n_epochs - 1
    with pytest.raises(ValueError, match="compaction"):
        _diff_table(lake, 0, last)


def _collect(ds) -> pa.Table:
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    tables = [t for t in tables if t.num_rows]
    t = pa.concat_tables(tables)
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def test_diff_value_cols(ray_session, tmp_path):
    """value_cols ride the changefeed as old_*/new_* payload columns,
    aligned with the key: nulls on the absent side of added/deleted
    rows, and exact old/new values (checked via `text`, which varies
    per lsn) on changed rows."""
    lake = _build(tmp_path)
    last = SMALL_SPEC.n_epochs - 1
    got = _collect(snapshot_diff(lake, 1, last, value_cols=("lang", "text")))
    for c in ("old_lang", "new_lang", "old_text", "new_text"):
        assert c in got.column_names

    added = got.filter(pc.equal(got.column("change"), "added"))
    assert added.column("old_text").null_count == added.num_rows
    assert added.column("new_text").null_count == 0
    deleted = got.filter(pc.equal(got.column("change"), "deleted"))
    assert deleted.column("new_text").null_count == deleted.num_rows
    assert deleted.column("old_text").null_count == 0

    old = snapshot_table(lake, upto_epoch=1)
    new = snapshot_table(lake, upto_epoch=last)
    o_text = dict(
        zip(old.column("url").to_pylist(), old.column("text").to_pylist())
    )
    n_text = dict(
        zip(new.column("url").to_pylist(), new.column("text").to_pylist())
    )
    changed = got.filter(pc.equal(got.column("change"), "changed"))
    for u, ot, nt in zip(
        changed.column("url").to_pylist(),
        changed.column("old_text").to_pylist(),
        changed.column("new_text").to_pylist(),
    ):
        assert ot == o_text[u] and nt == n_text[u], u


def test_diff_value_cols_across_evolution(ray_session, tmp_path):
    """A value column ADDED at the evolution fence: the pre-evolution
    endpoint has no such column, so the changefeed's old side is all
    null while the new side carries the post-fence values from the
    as-of-last view."""
    import dataclasses

    from go_data_publisher_ray.sources.generator import cached_fixture as _cf

    spec = dataclasses.replace(SMALL_SPEC, evolve_epoch=6)
    log = _cf(spec)
    lake = str(tmp_path / "lake_evolve")
    bootstrap(os.path.join(log, "base"), lake, P)
    apply_log(os.path.join(log, "events"), lake)

    last = spec.n_epochs - 1
    got = _collect(snapshot_diff(lake, 5, last, value_cols=("fetch_status",)))
    assert got.column("old_fetch_status").null_count == got.num_rows
    new_side = got.filter(pc.not_equal(got.column("change"), "deleted"))
    assert new_side.column("new_fetch_status").null_count < new_side.num_rows

    new = snapshot_table(lake, upto_epoch=last)
    want = dict(
        zip(new.column("url").to_pylist(), new.column("fetch_status").to_pylist())
    )
    for u, fs in zip(
        new_side.column("url").to_pylist(),
        new_side.column("new_fetch_status").to_pylist(),
    ):
        assert fs == want[u], u


def test_diff_empty_lake_skips_absent_value_col(ray_session, tmp_path):
    """ADVICE r4: the empty-lake branch of snapshot_diff must apply the
    same presence filter as make_partition_differ — a value column not
    (yet) in the TO-epoch schema is skipped, not a KeyError."""
    from go_data_publisher_ray.pipelines.apply import apply_epoch
    from go_data_publisher_ray.pipelines.snapshot import snapshot_diff
    from go_data_publisher_ray.state.manifest import Manifest

    lake = str(tmp_path / "lake")
    events = str(tmp_path / "events")
    Manifest(lake, 4)  # pages spec, no bootstrap: zero file entries
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("lsn", pa.int64()),
            ("op", pa.string()),
            ("text", pa.string()),
        ]
    )
    for e in (0, 1):
        os.makedirs(os.path.join(events, f"epoch={e}"))
        import pyarrow.parquet as pq

        pq.write_table(
            schema.empty_table(), os.path.join(events, f"epoch={e}", "c0.parquet")
        )
        apply_epoch(events, lake, e)

    d = snapshot_diff(lake, 0, 1, value_cols=("text", "not_yet_there"))
    t = d.take_all()
    assert t == []
    names = set(d.schema().names)
    assert {"old_text", "new_text"} <= names
    assert not any("not_yet_there" in n for n in names)
