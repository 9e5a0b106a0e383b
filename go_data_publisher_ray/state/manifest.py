"""Manifest log + per-partition checkpoints: the engine's commit truth.

This collapses the reference's state plane (SURVEY.md §3.4) into two
small JSON artifacts:

- ``manifest/epoch_{E}.json`` — one file per committed epoch listing the
  delta files it produced, the unified schema at that point, and the
  high watermark ``committed_at_lsn``.  Its *existence* is the commit
  (atomic rename), playing the role of the reference's
  commit-offsets-after-successful-bulk-index ordering invariant
  (``transactions-consumer/consume/transaction_consumer.go:150-154``):
  delta files are written first, the manifest rename is the commit
  point, and a crash in between leaves harmless orphan files that the
  idempotent re-run overwrites with identical bytes.
- ``manifest/compact_{C}.json`` — a compaction record: new base file per
  partition plus the epoch up to which deltas were folded in.
  Bootstrap (initial lake load) is compaction 0 with ``upto_epoch=-1``.
- ``checkpoints/part_{P}.json`` — per-partition lineage
  ``{partition, last_lsn, row_count, bytes}`` (the pebble watermark
  analog, ``transactions-producer/infrastructure/store/pebbledb/store.go:28-41``
  plus the three-field lineage of
  ``status-service/sync/tick_processor.go:172-183``).  Checkpoints are
  *derived* state, reconstructable from the manifests — so a crash
  between manifest commit and checkpoint refresh loses nothing.

All structures are small (O(partitions + epochs)); they are read/written
by the driver only.  Data files never appear here before they are fully
written (write-temp-then-rename everywhere).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa

from .. import schema as schema_mod
from .storage import get_storage


def atomic_write_bytes(path: str, data: bytes, *, sync: bool = True) -> None:
    """Atomic whole-object write via the storage adapter (POSIX:
    write-temp-then-rename; object store: atomic PUT) — safe under
    concurrent identical writers (last write wins with identical
    content — the ES ``_id`` overwrite analog).  ``sync=False`` skips
    fsync for *derived* state that can be rebuilt from the manifests
    (checkpoints) — the commit point itself is always fsync'd, like the
    reference's ``pebble.Sync`` watermark
    (`transactions-producer/infrastructure/store/pebbledb/store.go:35`).
    """
    get_storage().put_bytes(path, data, sync=sync)


def atomic_write_json(path: str, obj, *, sync: bool = True) -> None:
    atomic_write_bytes(path, json.dumps(obj, sort_keys=True, indent=1).encode(), sync=sync)


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


@dataclass
class FileEntry:
    path: str  # relative to the lake root
    partition: int
    rows: int
    bytes: int
    max_lsn: int

    def to_dict(self) -> dict:
        return self.__dict__.copy()

    @classmethod
    def from_dict(cls, d: dict) -> "FileEntry":
        return cls(**{k: d[k] for k in ("path", "partition", "rows", "bytes", "max_lsn")})


@dataclass
class LakeState:
    """The live view derived from all manifest records."""

    num_partitions: int
    committed_epochs: list[int] = field(default_factory=list)
    schema: pa.Schema | None = None
    schema_version: int = 0
    # per partition: the current base file (or None) and live delta files
    base: dict[int, FileEntry] = field(default_factory=dict)
    base_upto_epoch: dict[int, int] = field(default_factory=dict)
    deltas: dict[int, list[tuple[int, FileEntry]]] = field(default_factory=dict)

    def live_files(
        self, part: int, upto_epoch: int | None = None
    ) -> tuple[FileEntry | None, list[FileEntry]]:
        """Base + live deltas for a partition; ``upto_epoch`` gives the
        TIME-TRAVEL view as of that committed epoch (deltas beyond it
        excluded).  Travel behind the compaction horizon is impossible —
        those deltas were folded into the base — and raises."""
        base_upto = self.base_upto_epoch.get(part, -1)
        if upto_epoch is not None and base_upto > upto_epoch:
            raise ValueError(
                f"cannot time-travel to epoch {upto_epoch}: partition {part}'s "
                f"base already folds epochs up to {base_upto} (compaction is "
                f"the retention horizon)"
            )
        # key on (epoch, path): an epoch applied in backlog-bounded
        # slices (pipelines/apply.py slice_bytes) commits several delta
        # files per partition under ONE epoch — deterministic path order
        # keeps the merge stable (and FileEntry itself is unorderable)
        live = [
            fe
            for (e, fe) in sorted(
                self.deltas.get(part, []), key=lambda t: (t[0], t[1].path)
            )
            if e > base_upto and (upto_epoch is None or e <= upto_epoch)
        ]
        return self.base.get(part), live

    def last_lsn(self, part: int) -> int:
        base, deltas = self.live_files(part)
        lsns = [f.max_lsn for f in deltas] + ([base.max_lsn] if base else [])
        return max(lsns, default=0)


class Manifest:
    """Driver-side manifest/checkpoint manager for one lake directory."""

    def __init__(
        self,
        lake_dir: str,
        num_partitions: int | None = None,
        merge_spec=None,
        shard: tuple[int, int] | None = None,
    ):
        self.lake_dir = lake_dir
        self.manifest_dir = os.path.join(lake_dir, "manifest")
        self.checkpoint_dir = os.path.join(lake_dir, "checkpoints")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        meta_path = os.path.join(lake_dir, "lake.json")
        if os.path.exists(meta_path):
            self.meta = read_json(meta_path)
            if num_partitions is not None and num_partitions != self.meta["num_partitions"]:
                raise ValueError(
                    f"lake has {self.meta['num_partitions']} partitions, got {num_partitions}"
                )
        else:
            if num_partitions is None:
                raise ValueError("new lake needs num_partitions")
            self.meta = {"num_partitions": num_partitions, "format": "gdp-ray-lake-v1"}
            if merge_spec is not None:
                self.meta["merge_spec"] = merge_spec.to_dict()
            if shard is not None:
                # the lake's key-space shard (part % n == k) is part of its
                # identity: every later apply/verify must use the same one,
                # so it is fixed at creation like merge_spec
                self.meta["shard"] = [int(shard[0]), int(shard[1])]
            atomic_write_json(meta_path, self.meta)

    @property
    def num_partitions(self) -> int:
        return self.meta["num_partitions"]

    @property
    def merge_spec(self):
        """The entity's merge semantics (schema.MergeSpec); lakes
        created before specs existed are pages."""
        from ..schema import PAGES_SPEC, MergeSpec

        if "merge_spec" in self.meta:
            return MergeSpec.from_dict(self.meta["merge_spec"])
        return PAGES_SPEC

    @property
    def admin_epochs(self) -> set[int]:
        """Epoch numbers claimed by administrative commits (key
        erasure): an upstream epoch arriving under one of these numbers
        must be refused, not silently skipped-as-committed."""
        return set(self.meta.get("admin_epochs", []))

    def record_admin_epoch(self, epoch: int) -> None:
        eps = sorted(self.admin_epochs | {int(epoch)})
        self.meta["admin_epochs"] = eps
        atomic_write_json(os.path.join(self.lake_dir, "lake.json"), self.meta)

    @property
    def shard(self) -> tuple[int, int] | None:
        """Key-space shard ``(k, n)`` this lake owns (``part % n == k``),
        or None for an unsharded lake.  Recorded at bootstrap so apply
        and verify agree on which keys belong here."""
        s = self.meta.get("shard")
        return (int(s[0]), int(s[1])) if s else None

    # ------------------------------------------------------------------
    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch_{epoch:06d}.json")

    def committed_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("epoch_") and name.endswith(".json"):
                out.append(int(name[len("epoch_") : -len(".json")]))
        return sorted(out)

    def has_epoch(self, epoch: int) -> bool:
        return os.path.exists(self._epoch_path(epoch))

    def epoch_record(self, epoch: int) -> dict:
        return read_json(self._epoch_path(epoch))

    def commit_epoch(
        self,
        epoch: int,
        files: list[FileEntry],
        epoch_schema: pa.Schema,
        metrics: dict | None = None,
        overwrite: bool = False,
    ) -> dict:
        """THE commit point.  Files must already be durable.  Recording
        the unified schema here is the per-epoch schema-evolution fence
        (north_star: `pa.unify_schemas` per epoch).

        The commit is a conditional put — first writer wins, losers
        adopt the winner's record (concurrent appliers replay the same
        epoch to byte-identical files, so adopting is a no-op; see
        ``state/storage.py``).  ``overwrite=True`` is the force-reapply
        path (late data): a deliberate single-driver REPLACEMENT of an
        existing record, so it uses the plain last-writer-wins put."""
        state = self.load_state()
        if epoch_schema is None:
            epoch_schema = state.schema if state.schema is not None else pa.schema([])
        unified = (
            schema_mod.unify(state.schema, epoch_schema) if state.schema else epoch_schema
        )
        version = state.schema_version + (
            0 if state.schema is not None and unified.equals(state.schema) else 1
        )
        record = {
            "epoch": epoch,
            "files": [f.to_dict() for f in files],
            "schema": schema_mod.schema_to_json(unified),
            "schema_version": version,
            "committed_at_lsn": max((f.max_lsn for f in files), default=0),
            "metrics": metrics or {},
        }
        payload = json.dumps(record, sort_keys=True, indent=1).encode()
        if overwrite:
            get_storage().put_bytes(self._epoch_path(epoch), payload)
        elif not get_storage().put_bytes_if_absent(self._epoch_path(epoch), payload):
            # a concurrent applier committed this epoch first: adopt its
            # record (idempotent replays produce byte-identical delta
            # files at the SAME paths, so "ours" and "theirs" coincide;
            # any uniquely-named leftovers are orphans for vacuum) —
            # first-writer-wins, the ES create-semantics analog
            record = self.epoch_record(epoch)
        self.refresh_checkpoints()
        return record

    def _compact_upto(self) -> dict[int, int]:
        """Per-partition fold epoch from the compact records — ONE
        cached scan (invalidated by commit_compaction) serving both
        ``compaction_horizon`` and ``retention_floor``: apply_epoch and
        every tail/publish poll consult these, and re-parsing every
        compact record per poll is O(records) disk I/O on the hot path
        for values that only change when THIS process compacts."""
        if getattr(self, "_compact_upto_cache", None) is None:
            upto: dict[int, int] = {}
            for name in sorted(os.listdir(self.manifest_dir)):
                if name.startswith("compact_") and name.endswith(".json"):
                    rec = read_json(os.path.join(self.manifest_dir, name))
                    for fd in rec["files"]:
                        upto[fd["partition"]] = rec["upto_epoch"]
            self._compact_upto_cache = upto
        return self._compact_upto_cache

    def compaction_horizon(self) -> int:
        """The epoch below-or-at which EVERY partition's events are
        folded into its current base (-1 if any partition has no base):
        epochs <= horizon are fully represented by base files and must
        be skipped, never re-applied — the resume fence a repartitioned
        lake (pipelines/maintain.py) carries over from its source."""
        upto = self._compact_upto()
        return min(
            (upto.get(p, -1) for p in range(self.num_partitions)), default=-1
        )

    def retention_floor(self) -> int:
        """The MAX over partitions of the epoch folded into the current
        base: as-of reads (time travel, changefeed endpoints) are only
        servable at committed epochs >= this floor.  Compare
        ``compaction_horizon`` (the min — the resume fence)."""
        return max(self._compact_upto().values(), default=-1)

    def next_compaction_id(self) -> int:
        existing = [
            int(n[len("compact_") : -len(".json")])
            for n in os.listdir(self.manifest_dir)
            if n.startswith("compact_")
        ]
        return max(existing, default=-1) + 1

    def commit_compaction(
        self,
        upto_epoch: int,
        files: list[FileEntry],
        base_schema: pa.Schema,
        cid: int | None = None,
    ) -> dict:
        if cid is None:
            cid = self.next_compaction_id()
        record = {
            "compaction_id": cid,
            "upto_epoch": upto_epoch,
            "files": [f.to_dict() for f in files],
            "schema": schema_mod.schema_to_json(base_schema),
        }
        payload = json.dumps(record, sort_keys=True, indent=1).encode()
        if not get_storage().put_bytes_if_absent(
            os.path.join(self.manifest_dir, f"compact_{cid:06d}.json"), payload
        ):
            # compaction ids are allocated from the same listing two
            # racing compactors would both read — losing the conditional
            # put means another compactor claimed this id with a
            # DIFFERENT fold (unlike epoch replays, not byte-identical):
            # fail loudly rather than silently overwrite its commit
            raise RuntimeError(
                f"concurrent compaction: compact_{cid:06d}.json already "
                "committed by another process"
            )
        self._compact_upto_cache = None  # horizon/floor moved
        self.refresh_checkpoints()
        return record

    # ------------------------------------------------------------------
    def load_state(self) -> LakeState:
        state = LakeState(num_partitions=self.num_partitions)
        compactions = []
        epochs = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if not name.endswith(".json"):
                continue
            rec = read_json(os.path.join(self.manifest_dir, name))
            if name.startswith("compact_"):
                compactions.append(rec)
            elif name.startswith("epoch_"):
                epochs.append(rec)
        for rec in compactions:  # ascending compaction id: later overrides
            for fd in rec["files"]:
                fe = FileEntry.from_dict(fd)
                state.base[fe.partition] = fe
                state.base_upto_epoch[fe.partition] = rec["upto_epoch"]
        for rec in epochs:
            state.committed_epochs.append(rec["epoch"])
            for fd in rec["files"]:
                fe = FileEntry.from_dict(fd)
                state.deltas.setdefault(fe.partition, []).append((rec["epoch"], fe))
        # schema: unified over bootstrap + all committed epochs (epoch
        # records already store the cumulative unified schema)
        schemas = [schema_mod.schema_from_json(r["schema"]) for r in compactions + epochs]
        if schemas:
            state.schema = schema_mod.unify(*schemas)
        if epochs:
            state.schema_version = max(r["schema_version"] for r in epochs)
        return state

    # ------------------------------------------------------------------
    def refresh_checkpoints(self) -> None:
        """Recompute per-partition lineage from the manifests (derived,
        crash-safe)."""
        state = self.load_state()
        for part in range(self.num_partitions):
            base, deltas = state.live_files(part)
            files = ([base] if base else []) + deltas
            rec = {
                "partition": part,
                "last_lsn": state.last_lsn(part),
                "row_count": sum(f.rows for f in files),
                "bytes": sum(f.bytes for f in files),
            }
            atomic_write_json(
                os.path.join(self.checkpoint_dir, f"part_{part:05d}.json"),
                rec,
                sync=False,
            )

    def read_checkpoint(self, part: int) -> dict:
        return read_json(os.path.join(self.checkpoint_dir, f"part_{part:05d}.json"))
