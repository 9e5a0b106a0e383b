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
from ..state.storage import get_storage
from ..state.manifest import FileEntry, Manifest, atomic_write_json, read_json


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


def split_shard(src_lake: str, dst_a: str, dst_b: str, *, link: bool = True) -> dict:
    """Grow-the-fleet re-deal: split one shard lake ``k/n`` into two
    child lakes ``k/2n`` and ``(k+n)/2n`` that together own exactly the
    parent's key space and resume the SAME change log.

    This is the partition-count-preserving half of consumer-group
    rebalance (the reference grows by adding consumer services and
    letting Kafka re-assign partitions,
    `transactions-consumer/main.go:94-102`): key ownership is
    ``hash(key) % P % n``, so with P fixed, every physical partition
    dir of shard ``k/n`` maps deterministically to exactly one child —
    ``part % 2n == k`` stays, ``part % 2n == k+n`` moves.  The split is
    therefore METADATA-ONLY: lake.json (shard re-stamped, merge_spec /
    admin_epochs / num_partitions carried), manifest records with file
    entries filtered to the child's partitions (every epoch record is
    kept, so committed-epoch resume and the schema history are
    identical on both children), and the referenced data files
    hardlinked (``link=False`` copies — for cross-filesystem moves; on
    a real cluster this is an object-store/S3 server-side copy or a
    plain ownership handoff, never a rewrite).

    Run on a quiesced lake (no in-flight apply); an unsharded lake is
    treated as ``0/1``.  Applying ``split_shard`` to all n lakes of a
    fleet yields the 2n-fleet whose union equals the original table
    (tests/test_shard_redeal.py).
    """
    man = Manifest(src_lake)
    k, n = man.shard or (0, 1)
    P = man.num_partitions
    if 2 * n > P:
        raise ValueError(
            f"cannot split shard {k}/{n}: 2n={2 * n} shards exceed the lake's "
            f"{P} partitions (some children would own no partition); "
            "repartition the fleet to a higher partition count first"
        )
    children = [(dst_a, k, 2 * n), (dst_b, k + n, 2 * n)]
    # the LIVE file set must exist; superseded history referenced by
    # older manifest records may already be vacuumed — skipped, exactly
    # as unreachable on the child as it was on the parent
    state = man.load_state()
    live_paths = set()
    for part in range(P):
        b, ds_ = state.live_files(part)
        live_paths.update(fe.path for fe in ([b] if b else []) + ds_)
    out = {}
    for dst, ck, cn in children:
        if os.path.exists(dst):
            raise ValueError(f"destination lake {dst} already exists")
        # build the whole child in a sibling staging dir and rename it
        # into place only on success — a mid-split failure (e.g. a live
        # file vanishing under us) leaves no half-built child whose
        # lake.json would block the retry
        base = dst.rstrip(os.sep)
        # sweep ANY prior attempt's staging dir, not just this pid's: a
        # hard-killed split (SIGKILL/power loss — the except below never
        # ran) leaves a full hardlink/copy of the child behind that
        # nothing else reclaims (not vacuum, not erase_keys).  Concurrent
        # splits of one destination are unsupported (their os.rename
        # commits would race anyway), so a foreign-pid stage is dead.
        parent = os.path.dirname(base) or "."
        if os.path.isdir(parent):
            prefix = os.path.basename(base) + ".split-tmp-"
            for name in os.listdir(parent):
                if name.startswith(prefix):
                    shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
        stage = base + f".split-tmp-{os.getpid()}"
        try:
            os.makedirs(os.path.join(stage, "manifest"))
            os.makedirs(os.path.join(stage, "checkpoints"))
            meta = dict(man.meta)
            meta["shard"] = [ck, cn]
            atomic_write_json(os.path.join(stage, "lake.json"), meta)

            linked_rows = linked_bytes = nfiles = 0
            owned_parts = set()
            for name in sorted(os.listdir(man.manifest_dir)):
                if not name.endswith(".json"):
                    continue
                rec = read_json(os.path.join(man.manifest_dir, name))
                mine = [
                    f for f in rec.get("files", []) if f["partition"] % cn == ck
                ]
                rec = {**rec, "files": mine}
                atomic_write_json(os.path.join(stage, "manifest", name), rec)
                for fd in mine:
                    fe = FileEntry.from_dict(fd)
                    src_path = os.path.join(src_lake, fe.path)
                    dst_path = os.path.join(stage, fe.path)
                    if not os.path.exists(src_path):
                        if fe.path in live_paths:
                            raise FileNotFoundError(
                                f"live data file missing from source lake: {fe.path}"
                            )
                        continue  # vacuumed history: unreachable either way
                    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
                    if not os.path.exists(dst_path):
                        # hardlink where the substrate has them (free),
                        # else a full object copy — on an object store
                        # (GDP_STORAGE=objectstore, state/storage.py)
                        # split_shard ALWAYS runs in copy mode: one
                        # server-side copy per shared base file
                        if link:
                            try:
                                get_storage().link_or_copy(src_path, dst_path)
                            except OSError:
                                shutil.copy2(src_path, dst_path)
                        else:
                            shutil.copy2(src_path, dst_path)
                    linked_rows += fe.rows
                    linked_bytes += fe.bytes
                    nfiles += 1
                    owned_parts.add(fe.partition)
            Manifest(stage).refresh_checkpoints()
            os.rename(stage, dst)
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        out[f"{ck}/{cn}"] = {
            "lake": dst,
            "partitions": len(owned_parts),
            "files": nfiles,
            "rows": linked_rows,
            "bytes": linked_bytes,
        }
    return {"from": f"{k}/{n}", "children": out}
