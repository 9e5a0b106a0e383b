"""Change-log pre-partitioning for horizontally sharded ingest.

The reference scales by running one consumer service per Kafka
partition / index shard — the broker assigns each consumer a disjoint
slice of the log (`transactions-consumer/consume/transaction_consumer.go:72-91`
polls its assigned partitions only).  This module is the broker-side
half of that contract for a file-based log: it rewrites an
``events/epoch=E/*.parquet`` change log into
``out/shard=k/epoch=E/*.parquet`` where ``shard = url-hash-partition %
n_shards`` — the SAME hash the engine partitions by, so a driver
ingesting ``shard=k`` (with ``GDP_SHARD=k/n`` or ``shard=(k, n)``)
reads ONLY its keys and never pays to hash-and-drop other shards' rows.

n independent driver processes (own Ray session, own object store, own
lake) over the n shard dirs together reproduce the unsharded lake
exactly (tests/test_replay_equivalence.py::test_sharded_ingest_union_equals_full);
bench.py --multinode uses this to measure node-linear scaling.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

from ..functions.hashing import partition_for


def shard_events(
    events_dir: str,
    out_dir: str,
    n_shards: int,
    *,
    num_partitions: int = 32,
    key_col: str = "url",
) -> dict:
    """Rewrite each epoch of ``events_dir`` into per-shard epoch dirs.
    Idempotent overwrite; returns per-shard row counts."""
    import ray.data as rd

    from .apply import discover_epochs

    counts = {k: 0 for k in range(n_shards)}
    for epoch in discover_epochs(events_dir):
        edir = os.path.join(events_dir, f"epoch={epoch}")

        def add_shard(t: pa.Table) -> pa.Table:
            part = partition_for(t.column(key_col), num_partitions)
            return t.append_column("shard", pa.array(part % n_shards))

        staging = os.path.join(out_dir, f".staging_epoch_{epoch}")
        shutil.rmtree(staging, ignore_errors=True)
        rd.read_parquet(edir).map_batches(
            add_shard, batch_format="pyarrow"
        ).write_parquet(staging, partition_cols=["shard"])
        for k in range(n_shards):
            src = os.path.join(staging, f"shard={k}")
            dst = os.path.join(out_dir, f"shard={k}", f"epoch={epoch}")
            shutil.rmtree(dst, ignore_errors=True)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.isdir(src):
                os.rename(src, dst)
            else:
                os.makedirs(dst, exist_ok=True)  # empty shard: keep the fence
            import pyarrow.parquet as pq

            counts[k] += sum(
                pq.ParquetFile(os.path.join(dst, f)).metadata.num_rows
                for f in os.listdir(dst)
                if f.endswith(".parquet")
            )
        shutil.rmtree(staging, ignore_errors=True)
    return {"rows_per_shard": counts, "n_shards": n_shards}
