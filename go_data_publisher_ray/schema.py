"""Arrow schemas for the CDC lake and change log.

The reference declares fixed Go structs per service
(``transactions-producer/entities/tx.go:3-15``,
``tick-data-publisher/domain/tick_data.go:3-13``) with JSON on the wire;
here there is a single Arrow schema registry and zero-copy Arrow blocks
between stages. Binary payloads stay ``pa.binary()`` — the reference's
hex->base64 string transcoding (M1/M2,
``transactions-producer/external/archiver/client.go:56-85``) is an
artifact of JSON transport and is deliberately not reproduced.

Schema evolution (column add / int widen) is handled by
``pa.unify_schemas`` per epoch, mirroring the reference's tolerant JSON
decoding (unknown fields dropped, missing fields zero-filled,
``tick-data-publisher/domain/tick_data.go:8-12``) — except evolution is
explicit and recorded in the manifest instead of silent.
"""

from __future__ import annotations

import json

import pyarrow as pa

# The lake's base-table schema (Common-Crawl-style web pages) per
# BASELINE.json input_hint.  `lsn` is per-row lineage: the LSN of the
# change event that produced the row (0 for bootstrap rows).
PAGE_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
]

PAGE_SCHEMA = pa.schema(PAGE_FIELDS + [("lsn", pa.int64())])

# Change-event schema: page columns + CDC envelope.  `lsn` is the
# tick-number analog (strictly increasing, `entities/tx.go:8`); `epoch`
# is the commit fence (tick-interval analog, `entities/tx.go:17-25`);
# `op` is insert/update/delete.
EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("epoch", pa.int32()),
        ("op", pa.string()),
    ]
    + PAGE_FIELDS
)

# Delta files keep the op column (tombstones survive until compaction).
DELTA_SCHEMA = pa.schema(PAGE_FIELDS + [("lsn", pa.int64()), ("op", pa.string())])

OPS = ("insert", "update", "delete")

# Columns internal to the engine, dropped from user-facing snapshots.
# value_md5: per-row canonical digest of the VALUE columns, persisted
# by suppress-unchanged lakes (functions/hashing.row_value_md5).
INTERNAL_COLUMNS = ("op", "part", "salt", "urlhash", "value_md5")


from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class MergeSpec:
    """The merge semantics of one lake entity — what makes the engine
    generalize beyond web pages (the reference runs 4 entity pipelines:
    transactions, tick-data, computors, tick-intervals; SURVEY.md §2.8).

    - ``key_cols``: the upsert key (composite allowed).  The FIRST key
      column is the partition column — coarser than the full key, which
      is safe (same key always lands in the same partition) and lets a
      composite-keyed entity partition on its natural prefix.
    - ``order_cols``: conflict resolution, all descending — keep the
      row with the max tuple.  Pages: (warc_ts, lsn) = LWW with
      deterministic lsn tie-break.  Intervals: (to_lsn, lsn) = the
      reference's monotone keep-max-`to` merge
      (`tick-intervals-consumer/consume/intervals_processor.go:103-149`).
    - ``lsn_col``: per-row lineage ordinal for checkpoints/watermarks.
    - ``has_tombstones``: whether an ``op`` column with delete
      semantics exists (intervals never delete).
    - ``first_wins``: conflict resolution keeps the MIN order tuple
      instead of the max — first-writer-wins, the semantics of a
      content-addressed immutable store where the key is the content
      hash and any re-publish of the same key is by construction the
      same bytes, hence a no-op (the computors analog:
      `computors-consumer/consume/processor.go:146-173` skips the
      write when the identity already exists).
    - ``key_normalizer``: optional name (``functions/url.py
      KEY_NORMALIZERS``) of an idempotent transform applied to the
      partition key column at ingest, BEFORE the partition hash — e.g.
      ``"url_canonical"`` so crawl spelling variants of one page merge
      to one lake row.  Persisted in lake.json like every other merge
      semantic; the verify oracles apply the same transform to the
      source side so replay equivalence is checked against the
      canonical key space.
    - ``suppress_unchanged``: no-op update suppression — an incoming
      upsert whose VALUE columns equal the key's current winner is
      dropped at the delta write (web CDC: most re-crawls return the
      page unchanged; without this every one writes a delta row, a
      changefeed diff and replica traffic).  The final table's PAYLOAD
      per key is identical to plain replay; only the stored order
      columns (warc_ts/lsn) keep the FIRST time each value was seen
      instead of the last.  Requires a single-key, tombstoned,
      last-wins entity (first_wins already no-ops by construction) and
      persists an internal ``value_md5`` column in every lake file.
    """

    key_cols: tuple[str, ...] = ("url",)
    order_cols: tuple[str, ...] = ("warc_ts", "lsn")
    lsn_col: str = "lsn"
    has_tombstones: bool = True
    first_wins: bool = False
    key_normalizer: str | None = None
    suppress_unchanged: bool = False

    def __post_init__(self):
        if self.suppress_unchanged and (
            self.first_wins
            or not self.has_tombstones
            or len(self.key_cols) != 1
            or self.lsn_col not in self.order_cols
        ):
            raise ValueError(
                "suppress_unchanged needs a single-key, tombstoned, "
                "last-wins entity whose lsn_col is an order column "
                "(first_wins entities already no-op identical "
                f"re-publishes): {self.key_cols=} {self.has_tombstones=} "
                f"{self.first_wins=} {self.order_cols=} {self.lsn_col=}"
            )

    @property
    def partition_col(self) -> str:
        return self.key_cols[0]

    def to_dict(self) -> dict:
        return {
            "key_cols": list(self.key_cols),
            "order_cols": list(self.order_cols),
            "lsn_col": self.lsn_col,
            "has_tombstones": self.has_tombstones,
            "first_wins": self.first_wins,
            "key_normalizer": self.key_normalizer,
            "suppress_unchanged": self.suppress_unchanged,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "MergeSpec":
        return cls(
            key_cols=tuple(d["key_cols"]),
            order_cols=tuple(d["order_cols"]),
            lsn_col=d["lsn_col"],
            has_tombstones=d["has_tombstones"],
            # absent in lakes created before the content entity existed
            first_wins=d.get("first_wins", False),
            # absent in lakes created before key normalization existed
            key_normalizer=d.get("key_normalizer"),
            # absent in lakes created before no-op suppression existed
            suppress_unchanged=d.get("suppress_unchanged", False),
        )


def value_columns(names, spec: "MergeSpec") -> list[str]:
    """The VALUE columns of an entity: everything that is not key,
    order, lsn, epoch envelope, internal, or exchange plumbing.  The
    single definition shared by the suppress-unchanged digest writers
    and readers — both sides must agree or nothing ever matches."""
    skip = {
        *spec.key_cols,
        *spec.order_cols,
        spec.lsn_col,
        "epoch",
        "blob",
        "bidx",
        *INTERNAL_COLUMNS,
    }
    return [n for n in names if n not in skip]


PAGES_SPEC = MergeSpec()

# Second entity: processed tick-intervals as a lake table (epoch_id,
# from_lsn) -> keep max to_lsn — the metadata-plane entity proving the
# same manifest/delta/compaction machinery generalizes.
INTERVALS_SPEC = MergeSpec(
    key_cols=("epoch_id", "from_lsn"),
    order_cols=("to_lsn", "lsn"),
    lsn_col="lsn",
    has_tombstones=False,
)

# Third entity: content-addressed identities (the computors analog,
# K12 — `computors-consumer/consume/processor.go:146-173`): the key IS
# the content hash, so identical re-publishes map to the same key and
# first-writer-wins makes them end-to-end no-ops (nothing changes in
# the lake, nothing appears on the changefeed, nothing reaches a
# replica).  Tombstones exist for administrative erasure only — under
# first_wins a later delete event loses to the stored row by design
# (the store is immutable); erase_keys bumps the order DOWNWARD.
CONTENT_SPEC = MergeSpec(
    key_cols=("content_hash",),
    order_cols=("lsn",),
    lsn_col="lsn",
    has_tombstones=True,
    first_wins=True,
)


def schema_to_json(schema: pa.Schema) -> str:
    """Serialize a schema for the manifest (human-auditable JSON)."""
    return json.dumps([[f.name, str(f.type)] for f in schema])


def schema_from_json(s: str) -> pa.Schema:
    fields = json.loads(s)
    return pa.schema([(name, _type_from_str(t)) for name, t in fields])


_TYPE_PARSERS = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[ns]": pa.timestamp("ns"),
    "timestamp[s]": pa.timestamp("s"),
    "date32[day]": pa.date32(),
}


def _type_from_str(t: str) -> pa.DataType:
    if t in _TYPE_PARSERS:
        return _TYPE_PARSERS[t]
    if t.startswith("list<element: ") and t.endswith(">"):
        return pa.list_(_type_from_str(t[len("list<element: ") : -1]))
    raise ValueError(f"unsupported serialized arrow type: {t!r}")


def unify(*schemas: pa.Schema) -> pa.Schema:
    """Unify schemas across epochs: add-column and int-widen tolerated.

    `promote_options="permissive"` lets int32 widen to int64 etc.; new
    columns appear with nulls for earlier data (FIXTURES.md F3).
    """
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to the unified ``schema``: add missing columns as
    nulls, cast widened columns, order columns as in ``schema``."""
    cols = []
    n = len(table)
    names = set(table.schema.names)
    for field in schema:
        if field.name in names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.table(cols, schema=schema)
