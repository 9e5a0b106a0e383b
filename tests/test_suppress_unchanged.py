"""No-op update suppression (MergeSpec.suppress_unchanged).

Web-CDC's common case is a re-crawl that returns the page UNCHANGED;
without suppression every one writes a delta row, a changefeed diff
and replica traffic.  With it, an incoming upsert whose value columns
equal the key's current winner is dropped at the delta write — the
final table's payload per key is identical to plain replay, and the
stored order columns keep the first time each value was seen."""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.compact import compact
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import (
    replay_oracle_table,
    tables_equal,
    verify_partitions,
)
from go_data_publisher_ray.schema import PAGES_SPEC, MergeSpec
from go_data_publisher_ray.state.manifest import Manifest

P = 4
N = 60
_SPEC = dataclasses.replace(PAGES_SPEC, suppress_unchanged=True)


def _url(i: int) -> str:
    return f"http://site{i}.com/page"


def _payload(i: int, version: int) -> tuple[bytes, str]:
    return (f"<html>v{version} of {i}</html>".encode(), f"text v{version} of {i}")


def _rows(specs, epoch: int | None):
    """specs: list of (i, version, lsn, op)."""
    urls, htmls, texts, lsns, ops = [], [], [], [], []
    for i, ver, lsn, op in specs:
        urls.append(_url(i))
        h, t = _payload(i, ver)
        htmls.append(h)
        texts.append(t)
        lsns.append(lsn)
        ops.append(op)
    cols = {
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.asarray(lsns, dtype=np.int64) * 1000, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(urls), pa.string()),
        "lsn": pa.array(lsns, pa.int64()),
    }
    if epoch is not None:
        cols["op"] = pa.array(ops, pa.string())
        cols["epoch"] = pa.array(np.full(len(urls), epoch), pa.int32())
    return pa.table(cols)


@pytest.fixture()
def recrawl_log(tmp_path):
    """Base of N pages at v0, then:
    - epoch 0: FULL re-crawl, every page unchanged (all suppressible);
    - epoch 1: 20 changed to v1, 20 re-crawled unchanged, 5 deleted,
      5 brand-new keys;
    - epoch 2: one deleted key re-published with its PRE-delete value
      (must apply — the key is absent), one epoch-1-changed key
      re-published identically at v1 (suppressible).
    """
    base_dir = str(tmp_path / "base")
    events_dir = str(tmp_path / "events")
    os.makedirs(base_dir)
    pq.write_table(
        _rows([(i, 0, i + 1, "insert") for i in range(N)], None),
        os.path.join(base_dir, "chunk-00000.parquet"),
    )
    lsn = N + 1

    def _epoch(e, specs):
        edir = os.path.join(events_dir, f"epoch={e}")
        os.makedirs(edir)
        pq.write_table(_rows(specs, e), os.path.join(edir, "chunk-00000.parquet"))

    e0 = []
    for i in range(N):
        e0.append((i, 0, lsn, "upsert"))
        lsn += 1
    _epoch(0, e0)

    e1 = []
    for i in range(0, 20):  # changed
        e1.append((i, 1, lsn, "upsert"))
        lsn += 1
    for i in range(20, 40):  # unchanged re-crawl
        e1.append((i, 0, lsn, "upsert"))
        lsn += 1
    for i in range(40, 45):  # deletes
        e1.append((i, 0, lsn, "delete"))
        lsn += 1
    for i in range(N, N + 5):  # new keys
        e1.append((i, 0, lsn, "upsert"))
        lsn += 1
    _epoch(1, e1)

    e2 = [(40, 0, lsn, "upsert"), (0, 1, lsn + 1, "upsert")]
    lsn += 2
    _epoch(2, e2)
    return base_dir, events_dir


@pytest.mark.parametrize("exchange", ["sort", "ref"])
def test_suppression_end_to_end(ray_session, recrawl_log, tmp_path, exchange, monkeypatch):
    monkeypatch.setenv("GDP_EXCHANGE", exchange)
    base_dir, events_dir = recrawl_log
    lake = str(tmp_path / f"lake_{exchange}")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    after_boot = snapshot_table(lake)
    apply_log(events_dir, lake)
    man = Manifest(lake)

    # epoch 0 (full unchanged re-crawl): committed, but NO delta files
    rec0 = man.epoch_record(0)
    assert man.has_epoch(0)
    assert rec0["files"] == []
    # epoch 1: exactly changed(20) + deletes(5) + new(5) rows survive
    rec1 = man.epoch_record(1)
    assert sum(f["rows"] for f in rec1["files"]) == 30
    # epoch 2: the post-delete re-publish applies; the v1 repeat doesn't
    rec2 = man.epoch_record(2)
    assert sum(f["rows"] for f in rec2["files"]) == 1

    got = snapshot_table(lake)
    # final payload per key equals plain replay; order columns equal the
    # SUPPRESSED oracle exactly (first-seen order per value)
    want = replay_oracle_table(base_dir, events_dir, spec=_SPEC)
    ok, msg = tables_equal(got, want)
    assert ok, msg
    # the unchanged keys kept their BOOTSTRAP rows byte-for-byte
    boot_rows = {
        u: l
        for u, l in zip(
            after_boot.column("url").to_pylist(), after_boot.column("lsn").to_pylist()
        )
    }
    got_rows = dict(zip(got.column("url").to_pylist(), got.column("lsn").to_pylist()))
    for i in range(20, 40):
        assert got_rows[_url(i)] == boot_rows[_url(i)]  # never rewritten
    for i in range(0, 20):
        assert got_rows[_url(i)] != boot_rows[_url(i)]  # changed -> applied

    # distributed source-vs-sink verify agrees (key + payload compare)
    report = verify_partitions(lake, base_dir, events_dir)
    assert report["mismatched_partitions"] == []
    assert report["verified_rows"] > 0


def test_plain_lake_differs_only_in_order_cols(ray_session, recrawl_log, tmp_path):
    """Control: the same log without suppression produces the same
    (key, payload) view but LATER order columns for re-crawled keys —
    and pays delta rows for every no-op."""
    base_dir, events_dir = recrawl_log
    plain, supp = str(tmp_path / "plain"), str(tmp_path / "supp")
    bootstrap(base_dir, plain, P)
    apply_log(events_dir, plain)
    bootstrap(base_dir, supp, P, merge_spec=_SPEC)
    apply_log(events_dir, supp)

    tp, ts = snapshot_table(plain), snapshot_table(supp)
    value_cols = ["url", "html", "text", "lang"]
    sp = tp.select(value_cols).take(pc.sort_indices(tp, sort_keys=[("url", "ascending")]))
    ss = ts.select(value_cols).take(pc.sort_indices(ts, sort_keys=[("url", "ascending")]))
    ok, msg = tables_equal(sp, ss)
    assert ok, msg  # identical live keys + payloads
    # plain lake rewrote the unchanged keys (higher lsn); suppressed did not
    lp = dict(zip(tp.column("url").to_pylist(), tp.column("lsn").to_pylist()))
    ls = dict(zip(ts.column("url").to_pylist(), ts.column("lsn").to_pylist()))
    assert lp[_url(25)] > ls[_url(25)]
    # plain epoch 0 wrote N rows; suppressed wrote none
    assert sum(f["rows"] for f in Manifest(plain).epoch_record(0)["files"]) == N
    assert Manifest(supp).epoch_record(0)["files"] == []


def test_suppression_survives_compaction(ray_session, recrawl_log, tmp_path):
    """Compaction folds deltas into a new base and RE-STAMPS value_md5,
    so a re-crawl after compaction still suppresses."""
    base_dir, events_dir = recrawl_log
    lake = str(tmp_path / "lake_c")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    apply_log(events_dir, lake)
    compact(lake)

    # epoch 3: re-crawl every LIVE key with its current value
    live = snapshot_table(lake)
    cur_ver = {}
    for u, t in zip(live.column("url").to_pylist(), live.column("text").to_pylist()):
        i = int(u.split("site")[1].split(".")[0])
        cur_ver[i] = int(t.split("v")[1].split(" ")[0])
    edir = os.path.join(events_dir, "epoch=3")
    os.makedirs(edir)
    specs = [(i, v, 10_000 + i, "upsert") for i, v in sorted(cur_ver.items())]
    pq.write_table(_rows(specs, 3), os.path.join(edir, "chunk-00000.parquet"))
    apply_log(events_dir, lake)

    assert Manifest(lake).epoch_record(3)["files"] == []
    after = snapshot_table(lake)
    ok, msg = tables_equal(live, after)
    assert ok, msg  # byte-identical: nothing was rewritten

    # snapshot stays clean of the internal digest column
    assert "value_md5" not in after.schema.names


def test_changefeed_quiet_for_suppressed_epoch(ray_session, recrawl_log, tmp_path):
    """The changefeed publishes state DIFFS — a fully-suppressed epoch
    publishes zero data rows (no downstream churn)."""
    from go_data_publisher_ray.pipelines.publish import publish_changefeed

    base_dir, events_dir = recrawl_log
    lake = str(tmp_path / "lake_f")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    apply_log(events_dir, lake, stop_after=1)  # epoch 0 only: all no-ops
    out = publish_changefeed(
        lake, str(tmp_path / "feed"), value_cols=("text", "lang", "html")
    )
    assert sum(p.get("rows", 0) for p in out["published"]) == 0


def test_slice_bytes_refused_only_when_slicing_engages(
    ray_session, recrawl_log, tmp_path
):
    """Suppression + an ENGAGED slicer is refused (per-slice collapse
    is unsound vs the pre-epoch view); a bound the epoch fits inside —
    the GDP_SLICE_BYTES=auto steady state — applies normally."""
    from go_data_publisher_ray.pipelines.apply import apply_epoch

    base_dir, events_dir = recrawl_log
    # make epoch 0 multi-file so a small bound actually slices
    edir = os.path.join(events_dir, "epoch=0")
    t = pq.read_table(os.path.join(edir, "chunk-00000.parquet"))
    pq.write_table(t.slice(0, 30), os.path.join(edir, "chunk-00000.parquet"))
    pq.write_table(t.slice(30), os.path.join(edir, "chunk-00001.parquet"))
    lake = str(tmp_path / "lake_s")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    with pytest.raises(ValueError, match="slice_bytes"):
        apply_epoch(events_dir, lake, 0, slice_bytes=1024)
    out = apply_epoch(events_dir, lake, 0, slice_bytes=1 << 30)
    assert not out.get("skipped")
    assert Manifest(lake).epoch_record(0)["files"] == []  # all suppressed


def test_spec_validation():
    with pytest.raises(ValueError, match="suppress_unchanged"):
        MergeSpec(first_wins=False, has_tombstones=False, suppress_unchanged=True,
                  order_cols=("to", "lsn"))
    with pytest.raises(ValueError, match="suppress_unchanged"):
        MergeSpec(key_cols=("a", "b"), suppress_unchanged=True)
    with pytest.raises(ValueError, match="suppress_unchanged"):
        MergeSpec(order_cols=("warc_ts",), suppress_unchanged=True)  # lsn not an order col
    with pytest.raises(ValueError, match="suppress_unchanged"):
        MergeSpec(first_wins=True, order_cols=("lsn",), suppress_unchanged=True)


def test_value_digest_is_injective_across_field_boundaries():
    """Review finding: a tag-delimited serialization let values
    containing the tag bytes shift field boundaries, hashing DISTINCT
    payloads equal — under suppression that silently drops a real
    update.  The netstring framing (tag + decimal length + ':' +
    value) decodes unambiguously; these adversarial pairs must differ,
    and the Arrow fast path must equal the generic path on them."""
    from go_data_publisher_ray.functions.hashing import row_value_md5

    pairs = [
        ({"a": "1\x00S", "b": "2"}, {"a": "1", "b": "\x00S2"}),
        ({"a": "x:", "b": "y"}, {"a": "x", "b": ":y"}),
        ({"a": "S1", "b": ":z"}, {"a": "S", "b": "1:z"}),
        ({"a": "", "b": "N:"}, {"a": "N:", "b": ""}),
        ({"a": None, "b": "N:"}, {"a": "N:", "b": None}),
    ]
    for r1, r2 in pairs:
        t = pa.table({k: pa.array([r1[k], r2[k]], pa.string()) for k in r1})
        d = row_value_md5(t, list(r1)).to_pylist()
        assert d[0] != d[1], (r1, r2)
    # binary twin of the first pair
    t = pa.table(
        {
            "a": pa.array([b"1\x00B", b"1"], pa.binary()),
            "b": pa.array([b"2", b"\x00B2"], pa.binary()),
        }
    )
    d = row_value_md5(t, ["a", "b"]).to_pylist()
    assert d[0] != d[1]
    # fast path (string/binary) == generic path (forced via an int col
    # included in the digest set)
    tm = pa.table(
        {
            "a": pa.array(["x:", None], pa.string()),
            "b": pa.array([b"S9", b":"], pa.binary()),
            "c": pa.array([1, 2], pa.int64()),
        }
    )
    mixed = row_value_md5(tm, ["a", "b", "c"]).to_pylist()
    assert len(set(mixed)) == 2


def test_suppression_with_hot_key_salting(ray_session, recrawl_log, tmp_path):
    """salt>1 routes through the two-level salted collapse before the
    delta writer; the writer still sees the whole partition group, so
    suppression composes with hot-key salting unchanged."""
    base_dir, events_dir = recrawl_log
    lake = str(tmp_path / "lake_salt")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    apply_log(events_dir, lake, salt=4)
    assert Manifest(lake).epoch_record(0)["files"] == []
    got = snapshot_table(lake)
    want = replay_oracle_table(base_dir, events_dir, spec=_SPEC)
    ok, msg = tables_equal(got, want)
    assert ok, msg
