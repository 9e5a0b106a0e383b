"""Data-quality patch (M6): conditional rewrite of known-bad ranges.

The reference hard-codes fixups for known-bad tick ranges: when a tick
falls inside a bad interval, the stored value is replaced before
publishing (``status-service/sync/tick_processor.go:210-214``).  Here
the same shape is a vectorized conditional-rewrite stage applied at
normalize time (before the merge shuffle), driven by a declarative rule
list so ranges are config, not code.

A rule patches rows whose ``lsn``-like ordinal falls in ``[lo, hi]``
AND that fail a validity predicate on ``col`` (the reference's "only
fix records that are actually broken" guard).  Patched rows are
rewritten in place; a ``patched`` marker column can be requested for
audit sinks.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class PatchRule:
    """Rewrite ``set_col`` to ``set_value`` for rows with
    ``range_col`` in [lo, hi] that fail ``valid_min`` (value < valid_min
    counts as broken; None patches the whole range unconditionally)."""

    range_col: str
    lo: int
    hi: int
    set_col: str
    set_value: object
    valid_min: float | None = None


def patch_mask(table: pa.Table, rule: PatchRule) -> pa.Array:
    ordv = table.column(rule.range_col)
    mask = pc.and_(
        pc.greater_equal(ordv, rule.lo), pc.less_equal(ordv, rule.hi)
    )
    if rule.valid_min is not None:
        mask = pc.and_(mask, pc.less(table.column(rule.set_col), rule.valid_min))
    return mask


def apply_patch_rules(
    table: pa.Table, rules: tuple[PatchRule, ...], *, mark: bool = False
) -> pa.Table:
    """Vectorized conditional rewrite; one ``if_else`` per rule, no row
    loops.  With ``mark=True`` an int32 ``patched`` column records how
    many rules touched each row (audit/verification sink)."""
    if mark:
        patched = pa.nulls(table.num_rows, pa.int32()).fill_null(0)
    for rule in rules:
        mask = patch_mask(table, rule)
        col = table.column(rule.set_col)
        newcol = pc.if_else(mask, pa.scalar(rule.set_value, type=col.type), col)
        idx = table.schema.get_field_index(rule.set_col)
        table = table.set_column(idx, table.schema.field(idx), newcol)
        if mark:
            patched = pc.add(patched, pc.cast(mask, pa.int32()))
    if mark:
        table = table.append_column("patched", patched)
    return table
