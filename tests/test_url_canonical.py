"""Canonical-URL key normalization (MergeSpec.key_normalizer).

At crawl scale the same page arrives under spelling variants
(``HTTP://Example.com:80/a#frag`` vs ``http://example.com/a``); a lake
bootstrapped with ``key_normalizer="url_canonical"`` canonicalizes the
key BEFORE the partition hash, so variants co-locate and LWW-merge to
one row — and both replay-verification paths, plus point lookups by
any variant spelling, operate in the canonical key space."""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_data_publisher_ray.functions.url import (
    canonicalize_url,
    canonicalize_urls,
)
from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import lookup_keys, snapshot_table
from go_data_publisher_ray.pipelines.verify import (
    replay_oracle_table,
    tables_equal,
    verify_partitions,
)
from go_data_publisher_ray.schema import PAGES_SPEC

# (input, canonical) — the scalar spec's promised behavior
_CASES = [
    ("http://example.com/a", "http://example.com/a"),
    ("HTTP://Example.COM/a", "http://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # non-default port kept
    ("https://example.com:80/a", "https://example.com:80/a"),  # :80 not https default
    ("http://example.com/a#frag", "http://example.com/a"),
    ("HTTP://A.B:80/P?q=Z#f", "http://a.b/P?q=Z"),  # path/query case KEPT
    ("http://h/#f", "http://h/"),
    ("http://h#f", "http://h"),
    ("ftp://Host.Org/X", "ftp://host.org/X"),  # generic scheme: lower head only
    ("relative/path#frag", "relative/path#frag"),  # not absolute: untouched
    ("", ""),
    ("   ", "   "),
    ("http://", "http://"),
    ("http://Über.com/a", "http://Über.com/a"),  # non-ASCII: ascii_lower no-op
    # userinfo is case-SENSITIVE (RFC 3986): kept; host still lowered
    ("http://User:Pw@Host.com/X", "http://User:Pw@host.com/X"),
    ("HTTPS://U:p@H.io:443/a", "https://U:p@h.io/a"),
    ("http://U:80@Host.com/a", "http://U:80@host.com/a"),  # ':80' in userinfo kept
    ("http://@Host.com/a", "http://@host.com/a"),  # empty userinfo kept
    ("http://a@b@C.com/x", "http://a@b@c.com/x"),  # host = after LAST @
    ("http://[::1]:80/a", "http://[::1]/a"),  # IPv6 literal + default port
    ("http://[::1]:8080/a", "http://[::1]:8080/a"),
    ("http://h:8080/a", "http://h:8080/a"),  # ':8080' does not end with ':80'
    ("http://h/path@x", "http://h/path@x"),  # '@' in path is not userinfo
    # dirty repeated default-port suffix must collapse in ONE pass
    # (review finding: one-at-a-time strip broke idempotence and the
    # replica re-apply invariant)
    ("http://h:80:80/a", "http://h/a"),
    ("https://h:443:443/", "https://h/"),
]


def test_scalar_canonicalization_cases():
    for raw, want in _CASES:
        assert canonicalize_url(raw) == want, raw


def test_vectorized_matches_scalar_and_is_idempotent():
    raw = [c[0] for c in _CASES] + [None]
    got = canonicalize_urls(pa.array(raw, pa.string()))
    want = [canonicalize_url(u) for u in raw]
    assert got.to_pylist() == want
    # idempotence: canon(canon(x)) == canon(x) (replica re-apply safety)
    again = canonicalize_urls(got)
    assert again.to_pylist() == got.to_pylist()


P = 4
_SPEC = dataclasses.replace(PAGES_SPEC, key_normalizer="url_canonical")


def _variant(i: int, v: int) -> str:
    """Three spellings of the same logical page."""
    return [
        f"http://site{i}.com/page",
        f"HTTP://Site{i}.COM:80/page#ref",
        f"http://SITE{i}.com/page",
    ][v % 3]


def _rows(urls: list[str], lsns: np.ndarray, epoch: int | None, op: str = "update"):
    n = len(urls)
    cols = {
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(lsns * 1000, pa.timestamp("us")),
        "html": pa.array([f"<html>{u}</html>".encode() for u in urls], pa.binary()),
        "text": pa.array([f"text of {u}" for u in urls], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "lsn": pa.array(lsns, pa.int64()),
    }
    if epoch is not None:
        cols["op"] = pa.array([op] * n, pa.string())
        cols["epoch"] = pa.array(np.full(n, epoch), pa.int32())
    return pa.table(cols)


@pytest.fixture()
def variant_log(tmp_path):
    """40 logical pages; the base holds canonical spellings, the change
    log updates/deletes them under VARIANT spellings."""
    base_dir = str(tmp_path / "base")
    events_dir = str(tmp_path / "events")
    os.makedirs(base_dir)
    base_urls = [_variant(i, 0) for i in range(40)]
    pq.write_table(
        _rows(base_urls, np.zeros(40, dtype=np.int64), None),
        os.path.join(base_dir, "chunk-00000.parquet"),
    )
    lsn = 1
    for e in range(3):
        idx = np.arange(e, 40, 3)
        urls = [_variant(int(i), e + 1) for i in idx]
        lsns = np.arange(lsn, lsn + len(urls), dtype=np.int64)
        lsn += len(urls)
        edir = os.path.join(events_dir, f"epoch={e}")
        os.makedirs(edir)
        op = "delete" if e == 2 else "update"
        pq.write_table(
            _rows(urls, lsns, e, op=op), os.path.join(edir, "chunk-00000.parquet")
        )
    return base_dir, events_dir


def test_variant_spellings_merge_to_one_row(ray_session, variant_log, tmp_path):
    base_dir, events_dir = variant_log
    lake = str(tmp_path / "lake")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    apply_log(events_dir, lake)

    got = snapshot_table(lake)
    # epoch 2 deleted every third page under a variant spelling — the
    # delete must land on the SAME key as the canonical base row
    assert got.num_rows == 40 - len(range(2, 40, 3))
    urls = got.column("url").to_pylist()
    assert all(u == canonicalize_url(u) for u in urls)  # lake keys canonical
    # updated pages carry the update's payload (variant update found
    # the canonical row and won LWW)
    row = {u: t for u, t in zip(urls, got.column("text").to_pylist())}
    assert row["http://site0.com/page"].startswith("text of HTTP://Site0.COM")

    # replay equivalence in the canonical key space (driver oracle)
    want = replay_oracle_table(base_dir, events_dir, spec=_SPEC)
    ok, msg = tables_equal(got, want)
    assert ok, msg

    # distributed source-vs-sink verify (hash mode) agrees too
    report = verify_partitions(lake, base_dir, events_dir)
    assert report["mismatched_partitions"] == []
    assert report["verified_rows"] > 0

    # point lookup by ANY spelling variant finds the merged row
    hit = lookup_keys(lake, ["HTTP://Site1.COM:80/page#ref"])
    assert hit.num_rows == 1
    assert hit.column("url").to_pylist() == ["http://site1.com/page"]


def test_without_normalizer_variants_stay_separate(ray_session, variant_log, tmp_path):
    """Control: the same log into a DEFAULT pages lake keeps one row
    per raw spelling — normalization is opt-in, not silent."""
    base_dir, events_dir = variant_log
    lake = str(tmp_path / "lake_raw")
    bootstrap(base_dir, lake, P)
    apply_log(events_dir, lake)
    got = snapshot_table(lake)
    # base rows never collide with variant-spelled updates; deletes
    # (epoch 2, variant spelling) remove no base row
    assert got.num_rows > 40
    want = replay_oracle_table(base_dir, events_dir)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_normalizer_persisted_in_lake_json(ray_session, variant_log, tmp_path):
    """key_normalizer is part of the persisted MergeSpec: a fresh
    Manifest (new process analog) reads it back from lake.json."""
    from go_data_publisher_ray.state.manifest import Manifest

    base_dir, _events = variant_log
    lake = str(tmp_path / "lake_meta")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    assert Manifest(lake).merge_spec.key_normalizer == "url_canonical"
    assert Manifest(lake).merge_spec == _SPEC


def test_erase_by_variant_spelling(ray_session, variant_log, tmp_path):
    """GDPR erase on a canonical-key lake, requested under a VARIANT
    spelling: the canonical row must be physically removed (the raw
    spelling's hash target is a DIFFERENT partition — the erase must
    fold the canonical one)."""
    import glob

    from go_data_publisher_ray.pipelines.maintain import erase_keys

    base_dir, events_dir = variant_log
    lake = str(tmp_path / "lake_erase")
    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    apply_log(events_dir, lake)

    canonical = "http://site0.com/page"
    variant = "HTTP://Site0.COM:80/page#ref"
    before = snapshot_table(lake)
    assert canonical in before.column("url").to_pylist()

    r = erase_keys(lake, [variant])
    assert r["erased"] == 1

    after = snapshot_table(lake)
    assert canonical not in after.column("url").to_pylist()
    assert after.num_rows == before.num_rows - 1
    assert lookup_keys(lake, [variant]).num_rows == 0
    for f in glob.glob(os.path.join(lake, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        if "url" in t.schema.names:
            assert canonical not in set(t.column("url").to_pylist()), f


def test_publish_replicate_carries_normalizer(ray_session, variant_log, tmp_path):
    """Full downstream loop on a canonical-key lake: publish -> feed ->
    replicate; the replica equals the source AND inherits the
    normalizer through the feed's merge_spec (so later erases/lookups
    on the replica speak the same key space)."""
    from go_data_publisher_ray.pipelines.publish import (
        publish_changefeed,
        replicate,
    )
    from go_data_publisher_ray.pipelines.snapshot import export_snapshot
    from go_data_publisher_ray.state.manifest import Manifest

    base_dir, events_dir = variant_log
    lake = str(tmp_path / "lake_pub")
    feed = str(tmp_path / "feed")
    boot = str(tmp_path / "boot")
    replica = str(tmp_path / "replica")

    bootstrap(base_dir, lake, P, merge_spec=_SPEC)
    apply_log(events_dir, lake)
    out = publish_changefeed(lake, feed, value_cols=("text", "lang", "html"))
    export_snapshot(lake, boot, upto_epoch=out["bootstrap_epoch"])

    replicate(feed, replica, bootstrap_dir=boot, num_partitions=P)
    ok, msg = tables_equal(snapshot_table(lake), snapshot_table(replica))
    assert ok, msg
    assert Manifest(replica).merge_spec.key_normalizer == "url_canonical"


def test_normalizer_guards():
    """Clear errors instead of opaque Arrow kernel failures: unknown
    normalizer name; non-string key column (the intervals entity's
    int64 epoch_id shape)."""
    from go_data_publisher_ray.functions.url import normalize_key_column

    t = pa.table({"url": pa.array(["http://a/"], pa.string())})
    with pytest.raises(ValueError, match="unknown key_normalizer"):
        normalize_key_column(t, "url", "nope")
    ti = pa.table({"epoch_id": pa.array([1], pa.int64())})
    with pytest.raises(TypeError, match="string key column"):
        normalize_key_column(ti, "epoch_id", "url_canonical")


def test_cli_bootstrap_rejects_normalizer_on_non_pages(tmp_path):
    """bootstrap --entity intervals --key-normalizer must refuse at the
    CLI (the spec persists at creation; a bad combination would wedge
    every later apply)."""
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable, "-m", "go_data_publisher_ray.cli", "bootstrap",
            "--base", str(tmp_path), "--lake", str(tmp_path / "lk"),
            "--partitions", "2", "--entity", "intervals",
            "--key-normalizer", "url_canonical",
        ],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode != 0
    assert "pages entity only" in (r.stderr + r.stdout)
