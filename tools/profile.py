"""Per-stage profile of one registered query: run it and print Ray
Data's execution stats (`ds.stats()`), the measure-don't-guess loop for
operator tuning.

Usage: python tools/profile.py QUERY [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from go_data_publisher_ray.pipelines.queries import QUERIES

    t0 = time.perf_counter()
    out = QUERIES[name](sf_dir)
    if hasattr(out, "stats"):  # Dataset: materialize, then report
        mat = out.materialize()
        wall = time.perf_counter() - t0
        print(mat.stats())
        print(f"\nrows={mat.count()} wall={wall:.3f}s")
    else:
        wall = time.perf_counter() - t0
        print(f"(driver-side result; no Dataset stats) rows={len(out)} wall={wall:.3f}s")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
