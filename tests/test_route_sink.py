"""M5 physical dual-sink routing: both sinks' CONTENTS checked against
the route predicate, and the union against the source."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from go_data_publisher_ray.pipelines.route import sink_rows, write_routed

SF = "/root/testdata/sf0.001"


def _read_sink(out: str, route: str):
    d = os.path.join(out, f"route={route}")
    files = [
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files, f"sink {route} is empty on disk"
    import pyarrow as pa

    return pa.concat_tables([pq.read_table(f) for f in files])


def test_dual_sink_contents_match_predicate(ray_session, tmp_path):
    out = str(tmp_path / "sinks")
    counts = write_routed(
        os.path.join(SF, "events.parquet"),
        out,
        columns=["event_id", "event_type", "value"],
    )

    eph = _read_sink(out, "ephemeral")
    perm = _read_sink(out, "permanent")

    def is_eph(t):
        return pc.and_(
            pc.equal(t.column("event_type"), "view"), pc.less(t.column("value"), 5.0)
        )

    # every ephemeral row satisfies the predicate; no permanent row does
    assert pc.min(is_eph(eph)).as_py() is True
    assert pc.max(is_eph(perm)).as_py() is False

    # the two sinks partition the source exactly (no loss, no dup)
    src = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_id"])
    got_ids = sorted(
        eph.column("event_id").to_pylist() + perm.column("event_id").to_pylist()
    )
    assert got_ids == sorted(src.column("event_id").to_pylist())

    # the metadata-readback counts are the on-disk truth
    assert counts["ephemeral"] == eph.num_rows == sink_rows(out, "ephemeral")
    assert counts["permanent"] == perm.num_rows == sink_rows(out, "permanent")


def test_dual_sink_rerun_overwrites(ray_session, tmp_path):
    """Resumable: a re-run is a deterministic overwrite, not an append."""
    out = str(tmp_path / "sinks")
    c1 = write_routed(os.path.join(SF, "events.parquet"), out)
    c2 = write_routed(os.path.join(SF, "events.parquet"), out)
    assert c1 == c2
