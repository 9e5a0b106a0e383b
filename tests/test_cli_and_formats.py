"""CLI entrypoint, JSONL wire-format round trip, snapshot export, and
the int-widen flavor of schema evolution."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import export_snapshot, snapshot_table
from go_data_publisher_ray.pipelines.verify import replay_oracle_table, tables_equal
from go_data_publisher_ray.sources.jsonl import (
    jsonl_events_to_parquet,
    parquet_events_to_jsonl,
)
from go_data_publisher_ray.state.manifest import Manifest

P = 8


def test_jsonl_roundtrip_apply(ray_session, small_log, lake_dir, tmp_path):
    """Events delivered as base64-JSONL (the reference's wire format)
    produce the same lake as native parquet events."""
    events = os.path.join(small_log, "events")
    jsonl_dir = parquet_events_to_jsonl(events, str(tmp_path / "jsonl"))
    back = jsonl_events_to_parquet(jsonl_dir, str(tmp_path / "reparquet"))

    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(back, lake_dir)
    got = snapshot_table(lake_dir)
    want = replay_oracle_table(os.path.join(small_log, "base"), events)
    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_export_snapshot(ray_session, small_log, lake_dir, tmp_path):
    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(os.path.join(small_log, "events"), lake_dir)
    out = export_snapshot(lake_dir, str(tmp_path / "export"))
    want = snapshot_table(lake_dir)
    assert out["rows"] == want.num_rows
    readback = pq.read_table(str(tmp_path / "export"))
    assert readback.num_rows == want.num_rows
    assert set(readback.schema.names) == set(want.schema.names)


def test_export_snapshot_text_formats(ray_session, small_log, lake_dir, tmp_path):
    """csv/jsonl export sinks: binary columns hex-encode (the M1/M2
    boundary transcode convention); row content matches the parquet
    snapshot exactly after decoding."""
    import duckdb

    bootstrap(os.path.join(small_log, "base"), lake_dir, P)
    apply_log(os.path.join(small_log, "events"), lake_dir, stop_after=3)
    want = snapshot_table(lake_dir).sort_by("url")

    out = export_snapshot(lake_dir, str(tmp_path / "csv"), fmt="csv")
    assert out["format"] == "csv" and out["files"] > 0
    con = duckdb.connect()
    got = con.sql(
        f"SELECT * FROM read_csv_auto('{tmp_path}/csv/*.csv') ORDER BY url"
    ).arrow()
    assert got.num_rows == want.num_rows
    assert set(got.schema.names) == set(want.schema.names)
    # binary html round-trips through hex
    want_hex = [b.hex() for b in want.column("html").to_pylist()]
    assert got.column("html").to_pylist() == want_hex
    assert got.column("text").to_pylist() == want.column("text").to_pylist()

    out = export_snapshot(lake_dir, str(tmp_path / "jsonl"), fmt="jsonl")
    got = con.sql(
        f"SELECT * FROM read_json_auto('{tmp_path}/jsonl/*.json') ORDER BY url"
    ).arrow()
    assert got.num_rows == want.num_rows
    assert got.column("html").to_pylist() == want_hex

    import pytest

    with pytest.raises(ValueError, match="unknown export format"):
        export_snapshot(lake_dir, str(tmp_path / "x"), fmt="orc")


def test_schema_evolution_int_widen(ray_session, tmp_path):
    """F3 widen variant: a side column arrives int32, later epochs send
    it int64 — unify widens, early rows read back as int64."""
    lake = str(tmp_path / "lake")
    base_dir = str(tmp_path / "base")
    events_dir = str(tmp_path / "events")
    os.makedirs(base_dir)

    def page_cols(urls, lsns, ts0):
        n = len(urls)
        return {
            "url": pa.array(urls),
            "warc_ts": pa.array(
                np.arange(ts0, ts0 + n, dtype=np.int64), type=pa.timestamp("us")
            ),
            "html": pa.array([b"x"] * n, type=pa.binary()),
            "text": pa.array([f"t:{u}:{l}" for u, l in zip(urls, lsns)]),
            "lang": pa.array(["en"] * n),
            "lsn": pa.array(lsns, type=pa.int64()),
        }

    base = pa.table(page_cols([f"u{i}" for i in range(20)], [0] * 20, 0))
    pq.write_table(base, os.path.join(base_dir, "chunk-0.parquet"))

    # epoch 0: narrow int32 side column; epoch 1: same column as int64
    for epoch, dtype, lo in ((0, pa.int32(), 1), (1, pa.int64(), 11)):
        urls = [f"u{i}" for i in range(5)] + [f"new{epoch}_{i}" for i in range(5)]
        lsns = list(range(lo, lo + 10))
        t = pa.table(
            {
                "lsn": pa.array(lsns, type=pa.int64()),
                "epoch": pa.array([epoch] * 10, type=pa.int32()),
                "op": pa.array(["update"] * 10),
                **page_cols(urls, lsns, 1000 + lo * 10),
                "crawl_depth": pa.array(
                    np.arange(10) + (1 << 33 if dtype == pa.int64() else 0), type=dtype
                ),
            }
        )
        edir = os.path.join(events_dir, f"epoch={epoch}")
        os.makedirs(edir)
        pq.write_table(t, os.path.join(edir, "chunk-0.parquet"))

    bootstrap(base_dir, lake, 4)
    apply_log(events_dir, lake)
    state = Manifest(lake).load_state()
    assert state.schema.field("crawl_depth").type == pa.int64()

    got = snapshot_table(lake)
    assert got.schema.field("crawl_depth").type == pa.int64()
    want = replay_oracle_table(base_dir, events_dir)
    ok, msg = tables_equal(got, want)
    assert ok, msg
    # a widened value survived
    import pyarrow.compute as pc

    assert pc.max(got.column("crawl_depth")).as_py() >= (1 << 33)


def test_cli_end_to_end(ray_session, tmp_path):
    """Drive the module CLI exactly as `ray job submit` would (fresh
    process per command; each owns its Ray session)."""
    env = dict(os.environ, RAY_ADDRESS="local")
    root = str(tmp_path)

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "go_data_publisher_ray.cli", "--num-cpus", "4", *args],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    fx = run("generate", "--out", f"{root}/fx", "--events", "4000",
             "--base-rows", "1000", "--epoch-size", "1000")
    run("bootstrap", "--base", fx["base_dir"], "--lake", f"{root}/lake",
        "--partitions", "4")
    applied = run("apply", "--events", fx["events_dir"], "--lake", f"{root}/lake")
    assert len([r for r in applied if not r.get("skipped")]) == 4
    st = run("status", "--lake", f"{root}/lake")
    assert st["last_committed_epoch"] == 3 and st["gaps"] == []
    d = run("diff", "--lake", f"{root}/lake", "--from-epoch", "1", "--to-epoch", "3")
    assert d["changes"] and sum(d["changes"].values()) > 0
    tt = run("snapshot", "--lake", f"{root}/lake", "--out", f"{root}/tt",
             "--upto-epoch", "1")
    assert 0 < tt["rows"]
    run("compact", "--lake", f"{root}/lake")
    snap = run("snapshot", "--lake", f"{root}/lake", "--out", f"{root}/export")
    assert snap["rows"] > 0
    ver = run("verify", "--lake", f"{root}/lake", "--base", fx["base_dir"],
              "--events", fx["events_dir"])
    assert ver["replay_equivalent"] is True
    assert ver["lineage"]["mismatches"] == []
