"""Property-based tests of the LWW collapse kernel (hypothesis):
the algebraic properties that make the whole engine correct —
order-invariance, idempotence, and associativity (which is what allows
the in-batch pre-combine, hot-key salting two-level merge, and
base+delta compaction to be applied in any grouping)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from go_data_publisher_ray.stages.merge import lww_collapse


@st.composite
def event_tables(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    urls = [f"u{draw(st.integers(0, 7))}" for _ in range(n)]
    ts = [draw(st.integers(0, 5)) * 1000 for _ in range(n)]
    # lsn unique per row except planted exact duplicates
    lsn = list(range(1, n + 1))
    ops = [draw(st.sampled_from(["insert", "update", "delete"])) for _ in range(n)]
    payload = [f"p{u}:{l}" for u, l in zip(urls, lsn)]
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "lsn": pa.array(lsn, type=pa.int64()),
            "op": pa.array(ops),
            "text": pa.array(payload),
        }
    )


def _canon(t: pa.Table) -> list[tuple]:
    cols = ["url", "warc_ts", "lsn", "op", "text"]
    rows = list(zip(*[t.column(c).to_pylist() for c in cols]))
    return sorted(rows)


def _brute_force(t: pa.Table) -> list[tuple]:
    best: dict = {}
    for url, ts, lsn, op, text in zip(
        t.column("url").to_pylist(),
        t.column("warc_ts").to_pylist(),
        t.column("lsn").to_pylist(),
        t.column("op").to_pylist(),
        t.column("text").to_pylist(),
    ):
        key = (ts, lsn)
        if url not in best or key > (best[url][1], best[url][2]):
            best[url] = (url, ts, lsn, op, text)
    return sorted(best.values())


@settings(max_examples=200, deadline=None)
@given(event_tables())
def test_collapse_matches_bruteforce(t):
    assert _canon(lww_collapse(t)) == _brute_force(t)


@settings(max_examples=100, deadline=None)
@given(event_tables(), st.randoms())
def test_collapse_order_invariant(t, rnd):
    idx = list(range(t.num_rows))
    rnd.shuffle(idx)
    shuffled = t.take(pa.array(idx, type=pa.int64()))
    assert _canon(lww_collapse(t)) == _canon(lww_collapse(shuffled))


@settings(max_examples=100, deadline=None)
@given(event_tables())
def test_collapse_idempotent(t):
    once = lww_collapse(t)
    assert _canon(lww_collapse(once)) == _canon(once)


@settings(max_examples=100, deadline=None)
@given(event_tables(), st.integers(0, 60))
def test_collapse_associative(t, split):
    """collapse(A + B) == collapse(collapse(A) + collapse(B)) — the
    pre-combine / salting / compaction correctness property."""
    split = min(split, t.num_rows)
    a, b = t.slice(0, split), t.slice(split)
    direct = lww_collapse(pa.concat_tables([a, b]))
    staged = lww_collapse(
        pa.concat_tables([lww_collapse(a), lww_collapse(b)])
    )
    assert _canon(direct) == _canon(staged)
