"""Stretch demo (VERDICT r4 #8): ``slice_bytes`` at its design point.

One synthetic catch-up epoch LARGER than the object store — default
~8 GiB of epoch parquet on /dev/shm against a 6 GiB store cap — applied
with ``GDP_SLICE_BYTES`` bounding the exchange working set (the
MaxPollRecords analog, ``transactions-consumer/main.go:56``: an
upstream outage produces one giant epoch; the consumer must drain it in
bounded bites, not inhale it).

What it proves, in one JSON line for BASELINE.md:

- the apply COMPLETES with object-store spilling bounded by the slice
  size, not the backlog size (``spilled_gb`` from Ray's own counters);
- the slicing really triggered (``n_slices`` > 1, slice-tagged delta
  files in the manifest);
- replay equivalence HOLDS at this scale — the engine's own
  distributed source-vs-sink verify (``verify_partitions``) replays the
  full source and compares every partition, ``mismatches == 0``.

Optionally (``BACKLOG_COMPARE=1``) re-runs the same epoch UNSLICED into
a fresh lake to quantify the working-set difference (roughly doubles
the runtime; the unsliced run completes too — Ray spills — the point is
how much it has to).

Usage:  python tools/bench_backlog.py
Knobs:  BACKLOG_EVENTS (default 2_500_000 ~ 8 GiB at html 2-4 KiB),
        GDP_SLICE_GB (default 1.5), GRAFT_OBJ_STORE_GB (default 6),
        RAY_GRAFT_CPUS (default 32), BACKLOG_KEEP=1 to skip cleanup.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/dev/shm/gdp_backlog" if os.path.isdir("/dev/shm") else "/tmp/gdp_backlog"


def _du(path: str) -> int:
    total = 0
    for r, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(r, f))
    return total


def _spilled_gb() -> float:
    """Ray's cumulative object-store spill counter (GiB)."""
    try:
        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", txt)
        return round(int(m.group(1)) / 1024, 2) if m else 0.0
    except Exception:
        return -1.0


def _apply_into(fixture: str, lake: str, slice_bytes: int | None) -> dict:
    from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap

    shutil.rmtree(lake, ignore_errors=True)
    t0 = time.perf_counter()
    bootstrap(os.path.join(fixture, "base"), lake, 32)
    t_boot = time.perf_counter() - t0
    s0 = _spilled_gb()
    t1 = time.perf_counter()
    apply_log(
        os.path.join(fixture, "events"),
        lake,
        batch_size=131072,
        slice_bytes=slice_bytes,
    )
    t_apply = time.perf_counter() - t1
    from go_data_publisher_ray.state.manifest import Manifest

    man = Manifest(lake)
    state = man.load_state()
    n_slices = len(
        {
            re.search(r"_s(\d+)", fe.path).group(1)
            for p in range(man.num_partitions)
            for fe in state.live_files(p)[1]
            if "_s" in os.path.basename(fe.path)
        }
    )
    return {
        "sec_bootstrap": round(t_boot, 3),
        "sec_apply": round(t_apply, 3),
        "n_slices": n_slices,
        "spilled_gb": round(max(0.0, _spilled_gb() - max(s0, 0.0)), 2),
    }


def main() -> None:
    import ray

    n_events = int(os.environ.get("BACKLOG_EVENTS", "2500000"))
    slice_gb = float(os.environ.get("GDP_SLICE_GB", "1.5"))
    store_gb = float(os.environ.get("GRAFT_OBJ_STORE_GB", "6"))
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    from go_data_publisher_ray.sources.generator import LogSpec, cached_fixture

    spec = LogSpec(
        n_base=100_000,
        n_sites=500,
        n_events=n_events,
        epoch_size=n_events,  # ONE giant catch-up epoch
        chunk_size=25_000,  # ~n_events/25k files: file-granular slicing
        html_min=2048,
        html_max=4096,
        text_pad=256,
    )
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            object_store_memory=int(store_gb * 2**30),
        )
    fixture = cached_fixture(
        spec, root=os.path.join(ROOT, "fixture"), use_ray=True
    )
    src_gb = round(_du(os.path.join(fixture, "events")) / 2**30, 2)

    lake = os.path.join(ROOT, "lake_sliced")
    sliced = _apply_into(fixture, lake, int(slice_gb * 2**30))

    # replay equivalence at scale: the engine's own distributed verify
    from go_data_publisher_ray.pipelines.verify import verify_partitions

    t2 = time.perf_counter()
    v = verify_partitions(
        lake,
        os.path.join(fixture, "base"),
        os.path.join(fixture, "events"),
        record_deadletter=False,
    )
    sec_verify = round(time.perf_counter() - t2, 3)

    out = {
        "metric": "backlog_sliced_apply",
        "events": n_events,
        "epoch_gb": src_gb,
        "object_store_gb": store_gb,
        "slice_gb": slice_gb,
        "num_cpus": ncpu,
        **{f"sliced_{k}": x for k, x in sliced.items()},
        "verify_mismatched_partitions": v["mismatched_partitions"],
        "verify_rows": v["verified_rows"],
        "sec_verify": sec_verify,
        "events_per_sec": round(n_events / sliced["sec_apply"], 1),
    }
    if os.environ.get("BACKLOG_COMPARE") == "1":
        unsliced = _apply_into(fixture, os.path.join(ROOT, "lake_plain"), None)
        out.update({f"unsliced_{k}": x for k, x in unsliced.items()})
    print(json.dumps(out))
    ray.shutdown()
    if os.environ.get("BACKLOG_KEEP") != "1":
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
