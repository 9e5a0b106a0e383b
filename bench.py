"""Benchmark driver: headline CDC apply throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "events": N, "events_per_sec": N}

Env knobs:
  GRAFT_SF_DIR      testdata dir for the query timings (default sf0.1)
  RAY_GRAFT_CPUS    num_cpus for ray.init (default 32)
  GRAFT_BENCH_EVENTS / GRAFT_BENCH_BASE / GRAFT_BENCH_EPOCHS
                    CDC fixture size (default 2M events / 200k pages / 5 epochs)
  GRAFT_BENCH_QUERIES  comma list to restrict query timings ('' = skip)

`--scaling` runs the headline job at 8 and 32 cpus in fresh
subprocesses on the same (cached) input and reports both throughputs
plus scaling efficiency — the sandbox evidence for the north_rule's
two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("GRAFT_BENCH_EVENTS", "2000000"))
N_BASE = int(os.environ.get("GRAFT_BENCH_BASE", "200000"))
N_EPOCHS = int(os.environ.get("GRAFT_BENCH_EPOCHS", "5"))

# Queries timed at $GRAFT_SF_DIR; heavy O(candidate^2) demos excluded.
DEFAULT_BENCH_QUERIES = [
    "cdc_lww_latest",
    "cdc_watermark_per_epoch",
    "cdc_interval_merge",
    "agg_pricing_summary",
    "join_orders_by_region",
    "top1_latest_order_per_customer",
    "anti_join_clicks_no_purchase",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_token_count",
    "text_quality_score",
    "knn_bruteforce",
    "ann_ivf_assign",
    "multimodal_decode_meta",
]


def bench_spec():
    from go_data_publisher_ray.sources.generator import LogSpec

    return LogSpec(
        n_base=N_BASE,
        n_sites=2_000,
        n_events=N_EVENTS,
        epoch_size=max(1, N_EVENTS // N_EPOCHS),
        chunk_size=100_000,
        html_min=64,
        html_max=512,
        text_pad=48,
    )


def run_headline() -> dict:
    """Timed: bootstrap + full epoch apply + one compaction, on a fresh
    lake over a cached (pre-generated, page-cache-warmed) fixture."""
    from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
    from go_data_publisher_ray.pipelines.compact import compact
    from go_data_publisher_ray.sources.generator import cached_fixture

    spec = bench_spec()
    fixture = cached_fixture(spec, use_ray=True)

    # warm the OS page cache so both scaling levels measure compute+shuffle,
    # then flush dirty pages so generation IO doesn't bleed into the timing
    for root, _d, files in os.walk(fixture):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    os.sync()

    # lake on shm by default: the criterion measures engine compute +
    # shuffle scaling, not this sandbox's virtio-disk flush jitter
    lake_root = os.environ.get(
        "GRAFT_BENCH_LAKE_ROOT",
        "/dev/shm/gdp_bench" if os.path.isdir("/dev/shm") else "/tmp/gdp_ray_lakes",
    )
    lake = os.path.join(lake_root, f"bench_{spec.tag()}_{NUM_CPUS}")
    shutil.rmtree(lake, ignore_errors=True)

    num_partitions = 32
    t0 = time.perf_counter()
    bootstrap(os.path.join(fixture, "base"), lake, num_partitions)
    t_boot = time.perf_counter() - t0
    t1 = time.perf_counter()
    apply_log(os.path.join(fixture, "events"), lake, batch_size=131072)
    t_apply = time.perf_counter() - t1
    t2 = time.perf_counter()
    compact(lake)
    t_compact = time.perf_counter() - t2
    total = time.perf_counter() - t0
    return {
        "sec": round(total, 3),
        "sec_bootstrap": round(t_boot, 3),
        "sec_apply": round(t_apply, 3),
        "sec_compact": round(t_compact, 3),
        "events": N_EVENTS,
        "events_per_sec": round(N_EVENTS / t_apply, 1),
    }


def run_queries() -> dict:
    from go_data_publisher_ray.pipelines.queries import QUERIES

    names_env = os.environ.get("GRAFT_BENCH_QUERIES")
    names = (
        [n for n in names_env.split(",") if n]
        if names_env is not None
        else DEFAULT_BENCH_QUERIES
    )
    out = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        # consume (Datasets are lazy)
        if hasattr(res, "iter_batches"):
            for _ in res.iter_batches(batch_format="pyarrow"):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    headline = run_headline()
    queries = run_queries()
    ray.shutdown()

    print(
        json.dumps(
            {
                "metric": "cdc_upsert_apply_wall_sec",
                "value": headline["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "num_cpus": NUM_CPUS,
                **{k: v for k, v in headline.items() if k != "sec"},
            }
        )
    )


def scaling() -> None:
    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_QUERIES="")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # min-of-2 fresh processes: the sandbox's virtual disk adds
        # multi-second jitter (background flushes); min isolates the
        # compute+shuffle cost the criterion is about
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["sec_apply"] <= b["sec_apply"] else b

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    speedup = r_lo["sec_apply"] / r_hi["sec_apply"]
    eff = speedup / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_apply",
                "cpus": [lo, hi],
                "sec_apply": [r_lo["sec_apply"], r_hi["sec_apply"]],
                "events_per_sec": [r_lo["events_per_sec"], r_hi["events_per_sec"]],
                "sec_total": [r_lo["value"], r_hi["value"]],
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
                "events": r_lo["events"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
