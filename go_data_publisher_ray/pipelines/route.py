"""Physical dual-sink routing (M5): ephemeral vs permanent documents
written to two DISTINCT parquet sinks in one streaming pass.

The reference consumer routes each transaction to one of two
Elasticsearch indices by a money-flow predicate and bulk-writes both
(`transactions-consumer/consume/transaction_consumer.go:134-146`); here
the route is a vectorized Arrow predicate column and the two sinks are
hive-partitioned parquet directories (``route=ephemeral/`` /
``route=permanent/``) produced by ONE ``write_parquet`` — workers write
their own partition files directly, nothing funnels through the driver,
and a resumable re-run overwrites deterministically.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROUTES = ("ephemeral", "permanent")


def add_route(t: pa.Table) -> pa.Table:
    """The M5 predicate as a vectorized column: 'view' events below
    value 5 are ephemeral, everything else permanent (the single source
    of truth shared by the `cdc_route_split` count query and the
    physical dual-sink writer)."""
    eph = pc.and_(
        pc.equal(t.column("event_type"), "view"), pc.less(t.column("value"), 5.0)
    )
    return t.append_column(
        "route", pc.if_else(eph, pa.scalar("ephemeral"), pa.scalar("permanent"))
    )


def write_routed(
    events_path: str, out_dir: str, *, columns: list[str] | None = None
) -> dict:
    """Stream events through the route predicate into two physical
    parquet sinks (``out_dir/route=.../``).  Returns per-route row
    counts read back from the WRITTEN files' parquet metadata — the
    on-disk truth, not the writer's claim."""
    import ray.data as rd

    ds = rd.read_parquet(events_path, columns=columns)
    ds = ds.map_batches(add_route, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["route"], mode="overwrite")
    return {route: sink_rows(out_dir, route) for route in ROUTES}


def sink_rows(out_dir: str, route: str) -> int:
    """Row count of one sink from parquet footers (metadata-only)."""
    d = os.path.join(out_dir, f"route={route}")
    if not os.path.isdir(d):
        return 0
    return sum(
        pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        for root, _dirs, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )
