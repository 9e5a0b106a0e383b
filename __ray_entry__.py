"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in go_data_publisher_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: the flagship CDC pipeline — deterministic synthetic
  Common-Crawl-style pages + change log (BASELINE.json input_hint;
  /root/testdata has no such table, so it is synthesized, seeded, per
  the round brief), bootstrapped + applied epoch-by-epoch into the
  partitioned lake, returning the merged snapshot Dataset.
- ``queries()`` / ``oracle_sql()``: the operator registry
  (go_data_publisher_ray/pipelines/queries.py) — SURVEY.md §2 coverage
  over the driver's TPC-H-ish tables plus the training-data operators,
  each with an exact DuckDB twin except the rows-only flagship.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: CDC upsert-apply over a synthetic page lake; returns
    the merged snapshot as a streaming Dataset."""
    import os

    from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
    from go_data_publisher_ray.pipelines.queries import _flagship_spec, flagship_fixture_dir
    from go_data_publisher_ray.pipelines.snapshot import snapshot

    spec = _flagship_spec()
    fixture = flagship_fixture_dir()
    # lake path keyed by fixture tag (includes generator version) so a
    # code change never resumes onto a stale-format cached lake
    lake = os.path.join("/tmp/gdp_ray_lakes", "entry_" + spec.tag())
    bootstrap(os.path.join(fixture, "base"), lake, 8)
    apply_log(os.path.join(fixture, "events"), lake)
    return snapshot(lake)


def queries() -> dict[str, Callable[[str], Any]]:
    from go_data_publisher_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from go_data_publisher_ray.pipelines.queries import (
        ORACLE_SQL,
        flagship_fixture_dir,
        suppress_fixture_dir,
    )

    # these oracles read their fixtures' on-disk parquet directly;
    # make sure they exist even if the SQL runs before the Ray query
    flagship_fixture_dir()
    suppress_fixture_dir()
    return dict(ORACLE_SQL)
