"""Stretch demo (VERDICT r4 #8): ``slice_bytes`` at its design point.

One synthetic catch-up epoch LARGER than the object store — default
~8 GiB of epoch parquet on /dev/shm against a 6 GiB store cap — applied
with ``GDP_SLICE_BYTES`` bounding the per-pass working set (the
MaxPollRecords analog, ``transactions-consumer/main.go:56``: an
upstream outage produces one giant epoch; the consumer must drain it in
bounded bites, not inhale it).

What it runs and proves, one JSON line for BASELINE.md:

1. ``ref_sliced`` — the production path (payload-reference exchange,
   sliced): completes fast; the exchange never holds more than a
   slice of light rows, payloads take the once-written spill-file path.
2. ``sort_sliced`` — the DESIGN POINT: the full-payload sort exchange
   (GDP_EXCHANGE unset), where the whole epoch at once would exceed the
   store.  With slices <= slice_gb each pass's shuffle fits, so the
   8 GiB epoch applies through a 6 GiB store without spill-thrash.
3. Slice-invariance AT SCALE: the two lakes (different exchanges,
   different slice layouts) are compared partition-by-partition —
   merged state must be identical.  This is a map over partitions
   (each task merges its partition from both lakes and diffs), NOT a
   shuffle: the distributed ``verify_partitions`` replay shuffles full
   payload rows and is not sized for a single epoch larger than one
   node's store (measured: its sort stalls at this config — noted in
   BASELINE.md; at fleet scale the aggregate store makes it moot, and
   source-replay equivalence stays pinned by the sf-scale suites).
4. Optional negative control (``BACKLOG_NEGATIVE=1``): the unsliced
   full-payload sort in a subprocess with a watchdog — expected to
   stall against the 6 GiB store exactly like verify's sort; recorded
   as ``stalled_after_sec`` when the watchdog fires.

Usage:  python tools/bench_backlog.py
Knobs:  BACKLOG_EVENTS (default 2_500_000 ~ 8 GiB at html 2-4 KiB),
        GDP_SLICE_GB (default 1.5), GRAFT_OBJ_STORE_GB (default 6),
        RAY_GRAFT_CPUS (default 32), BACKLOG_KEEP=1 to skip cleanup,
        BACKLOG_NEGATIVE=1 to run the watchdogged unsliced control.
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
N_EVENTS = int(os.environ.get("BACKLOG_EVENTS", "2500000"))
STORE_GB = float(os.environ.get("GRAFT_OBJ_STORE_GB", "6"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _spec():
    from go_data_publisher_ray.sources.generator import LogSpec

    return LogSpec(
        n_base=100_000,
        n_sites=500,
        n_events=N_EVENTS,
        epoch_size=N_EVENTS,  # ONE giant catch-up epoch
        chunk_size=25_000,  # ~N/25k files: file-granular slicing
        html_min=2048,
        html_max=4096,
        text_pad=256,
    )


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            object_store_memory=int(STORE_GB * 2**30),
            logging_level="ERROR",
        )


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


def _apply_into(
    fixture: str, lake: str, slice_bytes: int | None, exchange: str | None
) -> dict:
    from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap

    if exchange is None:
        os.environ.pop("GDP_EXCHANGE", None)  # default full-payload sort
    else:
        os.environ["GDP_EXCHANGE"] = exchange
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
            re.search(r"_s(\d+)", os.path.basename(fe.path)).group(1)
            for p in range(man.num_partitions)
            for fe in state.live_files(p)[1]
            if "_s" in os.path.basename(fe.path)
        }
    )
    return {
        "sec_bootstrap": round(t_boot, 3),
        "sec_apply": round(t_apply, 3),
        "events_per_sec": round(N_EVENTS / t_apply, 1),
        "n_slices": n_slices,
        "spilled_gb": round(max(0.0, _spilled_gb() - max(s0, 0.0)), 2),
    }


def _lakes_equal(lake_a: str, lake_b: str) -> dict:
    """Partition-parallel merged-state equality between two lakes — a
    map over partition descriptors (each task merges one partition from
    BOTH lakes and diffs), no shuffle, so it works at any epoch:store
    ratio."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from go_data_publisher_ray import schema as schema_mod
    from go_data_publisher_ray.pipelines.snapshot import _snapshot_items
    from go_data_publisher_ray.state.manifest import Manifest

    ja, sa = _snapshot_items(Manifest(lake_a))
    jb, sb = _snapshot_items(Manifest(lake_b))
    sa_json, sb_json = schema_mod.schema_to_json(sa), schema_mod.schema_to_json(sb)
    A = {_json.loads(i["payload"])["part"]: i["payload"] for i in ja}
    B = {_json.loads(i["payload"])["part"]: i["payload"] for i in jb}
    if set(A) != set(B):
        return {"mismatched": sorted(set(A) ^ set(B)), "rows": 0}
    pairs = [{"part": p, "a": A[p], "b": B[p]} for p in sorted(A)]
    spec_a = Manifest(lake_a).merge_spec.to_dict()
    spec_b = Manifest(lake_b).merge_spec.to_dict()

    def cmp_one(batch: "pa.Table") -> "pa.Table":
        import json

        import pyarrow.compute as pc

        from go_data_publisher_ray.pipelines.verify import tables_equal
        from go_data_publisher_ray.schema import MergeSpec
        from go_data_publisher_ray.stages.merge import (
            merge_partition_files,
            strip_internal,
        )
        from go_data_publisher_ray.state.manifest import FileEntry

        def merged(lake, payload, schema_json, spec_dict):
            s = json.loads(payload)
            t = merge_partition_files(
                lake,
                FileEntry.from_dict(s["base"]) if s["base"] else None,
                [FileEntry.from_dict(d) for d in s["deltas"]],
                schema_mod.schema_from_json(schema_json),
                keep_tombstones=False,
                spec=MergeSpec.from_dict(spec_dict),
            )
            t = strip_internal(t)
            if t.num_rows:
                t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
            return t

        out = []
        for row in batch.to_pylist():
            ta = merged(lake_a, row["a"], sa_json, spec_a)
            tb = merged(lake_b, row["b"], sb_json, spec_b)
            ok, _msg = tables_equal(ta, tb)
            out.append({"part": row["part"], "ok": ok, "rows": ta.num_rows})
        return pa.Table.from_pylist(out)

    res = (
        rd.from_items(pairs)
        .map_batches(cmp_one, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    return {
        "partitions": len(res),
        "mismatched": sorted(r["part"] for r in res if not r["ok"]),
        "rows": int(sum(r["rows"] for r in res if r["ok"])),
    }


def _negative_child(fixture: str) -> None:
    """Watchdogged child: the unsliced full-payload sort against the
    capped store — expected to stall; the parent kills it on timeout."""
    _ray_init()
    r = _apply_into(fixture, os.path.join(ROOT, "lake_neg"), None, None)
    print(json.dumps({"negative_completed": r}))


def main() -> None:
    import ray

    from go_data_publisher_ray.sources.generator import cached_fixture

    if "--negative-child" in sys.argv:
        fixture = cached_fixture(_spec(), root=os.path.join(ROOT, "fixture"))
        _negative_child(fixture)
        ray.shutdown()
        return

    slice_gb = float(os.environ.get("GDP_SLICE_GB", "1.5"))
    _ray_init()
    fixture = cached_fixture(
        _spec(), root=os.path.join(ROOT, "fixture"), use_ray=True
    )
    src_gb = round(_du(os.path.join(fixture, "events")) / 2**30, 2)
    slice_bytes = int(slice_gb * 2**30)

    lake_ref = os.path.join(ROOT, "lake_ref_sliced")
    lake_sort = os.path.join(ROOT, "lake_sort_sliced")
    ref_sliced = _apply_into(fixture, lake_ref, slice_bytes, "ref")
    sort_sliced = _apply_into(fixture, lake_sort, slice_bytes, None)

    t2 = time.perf_counter()
    eq = _lakes_equal(lake_ref, lake_sort)
    sec_eq = round(time.perf_counter() - t2, 3)

    # the REAL replay-equivalence claim at the design point: the
    # distributed source-vs-sink verify in hash mode (light-row
    # exchange — keys + orders + payload md5 — so the verify shuffle is
    # bounded no matter how the epoch compares to the store)
    from go_data_publisher_ray.pipelines.verify import verify_partitions

    t3 = time.perf_counter()
    v = verify_partitions(
        lake_sort,
        os.path.join(fixture, "base"),
        os.path.join(fixture, "events"),
        record_deadletter=False,
    )
    verify = {
        "mismatched": v["mismatched_partitions"],
        "rows": v["verified_rows"],
        "sec": round(time.perf_counter() - t3, 3),
    }

    out = {
        "metric": "backlog_sliced_apply",
        "events": N_EVENTS,
        "epoch_gb": src_gb,
        "object_store_gb": STORE_GB,
        "slice_gb": slice_gb,
        "num_cpus": NCPU,
        "ref_sliced": ref_sliced,
        "sort_sliced": sort_sliced,
        "equivalence": {**eq, "sec": sec_eq},
        "replay_verify_hash_mode": verify,
    }

    if os.environ.get("BACKLOG_NEGATIVE") == "1":
        import subprocess

        ray.shutdown()  # the child owns the store for an honest control
        budget = int(os.environ.get("BACKLOG_NEGATIVE_TIMEOUT", "900"))
        t3 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--negative-child"],
                timeout=budget,
                capture_output=True,
                text=True,
            )
            tail = proc.stdout.strip().splitlines()
            out["negative"] = (
                json.loads(tail[-1]) if tail else {"exit": proc.returncode}
            )
        except subprocess.TimeoutExpired:
            out["negative"] = {
                "stalled_after_sec": round(time.perf_counter() - t3, 1),
                "note": "unsliced full-payload sort vs capped store: "
                "watchdog fired (the failure mode slicing exists to avoid)",
            }

    print(json.dumps(out))
    if ray.is_initialized():
        ray.shutdown()
    if os.environ.get("BACKLOG_KEEP") != "1":
        # lakes are per-run; the fixture is a keyed cache (~30 min to
        # regenerate) — only BACKLOG_CLEAN_FIXTURE=1 removes it too
        for d in os.listdir(ROOT):
            if d.startswith("lake_"):
                shutil.rmtree(os.path.join(ROOT, d), ignore_errors=True)
        if os.environ.get("BACKLOG_CLEAN_FIXTURE") == "1":
            shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
