"""Measure no-op update suppression (MergeSpec.suppress_unchanged) on a
re-crawl-heavy workload: N pages bootstrapped, then one epoch re-crawls
every page with only CHANGED_PCT% actually changed — the web-CDC common
case.  Reports apply wall, delta rows/bytes for a plain lake vs a
suppressing lake (changefeed quietness is asserted in
tests/test_suppress_unchanged.py).

Usage: python tools/bench_suppress.py [n_pages] [changed_pct]
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.schema import PAGES_SPEC
from go_data_publisher_ray.state.manifest import Manifest

P = 32
HTML_PAD = 2048  # ~2 KiB payload per page, Common-Crawl-ish


def _table(n, version: np.ndarray, lsn0: int, epoch: int | None):
    urls = [f"http://site{i}.com/p" for i in range(n)]
    htmls = [
        (f"<html>v{int(v)} of {i}</html>" + "x" * HTML_PAD).encode()
        for i, v in enumerate(version)
    ]
    texts = [f"text v{int(v)} of {i}" for i, v in enumerate(version)]
    lsns = np.arange(lsn0, lsn0 + n, dtype=np.int64)
    cols = {
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(lsns * 1000, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "lsn": pa.array(lsns, pa.int64()),
    }
    if epoch is not None:
        cols["op"] = pa.array(["upsert"] * n, pa.string())
        cols["epoch"] = pa.array(np.full(n, epoch), pa.int32())
    return pa.table(cols)


def main() -> None:
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    changed_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    root = tempfile.mkdtemp(prefix="gdp_suppress_")
    base_dir = os.path.join(root, "base")
    events_dir = os.path.join(root, "events", "epoch=0")
    os.makedirs(base_dir)
    os.makedirs(events_dir)
    pq.write_table(
        _table(n, np.zeros(n), 1, None), os.path.join(base_dir, "chunk-0.parquet")
    )
    # the re-crawl: every page re-published, only changed_pct% changed
    ver = np.zeros(n)
    changed = np.random.default_rng(7).random(n) < changed_pct / 100
    ver[changed] = 1
    pq.write_table(
        _table(n, ver, n + 1, 0), os.path.join(events_dir, "chunk-0.parquet")
    )

    out = {"n_pages": n, "changed_pct": changed_pct, "payload_bytes": HTML_PAD}
    for mode, spec in (
        ("plain", None),
        ("suppress", dataclasses.replace(PAGES_SPEC, suppress_unchanged=True)),
    ):
        lake = os.path.join(root, f"lake_{mode}")
        bootstrap(base_dir, lake, P, merge_spec=spec)
        t0 = time.perf_counter()
        apply_log(os.path.dirname(events_dir), lake)
        sec = time.perf_counter() - t0
        rec = Manifest(lake).epoch_record(0)
        out[mode] = {
            "sec_apply": round(sec, 3),
            "delta_rows": sum(f["rows"] for f in rec["files"]),
            "delta_bytes": sum(f["bytes"] for f in rec["files"]),
        }
    p, s = out["plain"], out["suppress"]
    out["delta_bytes_ratio"] = round(p["delta_bytes"] / max(s["delta_bytes"], 1), 1)
    out["apply_speedup"] = round(p["sec_apply"] / s["sec_apply"], 2)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
