"""Hot-key salting: the two-level (part, salt) -> part collapse must not
change results (LWW collapse is associative), while bounding the size of
any single first-pass group — the explicit skew handling the reference
lacks (SURVEY.md §4: epoch-keyed Kafka partitioning concentrates an
epoch on one partition)."""

from __future__ import annotations

import dataclasses
import os

import pyarrow.compute as pc

from go_data_publisher_ray.pipelines.apply import apply_log, bootstrap
from go_data_publisher_ray.pipelines.snapshot import snapshot_table
from go_data_publisher_ray.pipelines.verify import tables_equal
from go_data_publisher_ray.sources.generator import cached_fixture, event_chunk

from conftest import SMALL_SPEC

P = 8

# crank the skew so a handful of urls dominate
HOT_SPEC = dataclasses.replace(SMALL_SPEC, skew=6.0)


def test_salting_matches_unsalted(ray_session, tmp_path):
    log = cached_fixture(HOT_SPEC)
    base, events = os.path.join(log, "base"), os.path.join(log, "events")

    plain = str(tmp_path / "plain")
    bootstrap(base, plain, P)
    apply_log(events, plain)
    want = snapshot_table(plain)

    salted = str(tmp_path / "salted")
    bootstrap(base, salted, P)
    apply_log(events, salted, salt=4)
    got = snapshot_table(salted)

    ok, msg = tables_equal(got, want)
    assert ok, msg


def test_fixture_is_actually_skewed():
    t = event_chunk(HOT_SPEC, 0)
    counts = pc.value_counts(t.column("url"))
    top = max(c["counts"] for c in counts.to_pylist())
    assert top > len(t) * 0.02, "hot-key fixture lost its skew"
