"""Micro-benchmark: per-row Python text kernels vs the vectorized Arrow
twins in `functions/text.py` (round-5 VERDICT item #1).

Runs single-process (no Ray) over the sf0.1 `documents` table tiled to
~60k docs, checks exact parity first, then times both sides.  The
numbers this prints are the ones recorded in COVERAGE.md round-5 notes.

Usage: python tools/bench_text_kernels.py [sf_dir] [tile]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from go_data_publisher_ray.functions import text as T  # noqa: E402


def _parity(col: pa.Array, texts: list[str]) -> None:
    assert np.array_equal(
        T.count_word_tokens_arrow(col), T.count_word_tokens(texts)
    )
    assert np.array_equal(
        T.ws_token_counts(col),
        np.array([len(T.whitespace_tokens(t)) for t in texts]),
    )
    msets = [T.LANG_MARKERS[l] for l in T.LANG_PRIORITY]
    M = T.marker_count_matrix(col, msets)
    for j, m in enumerate(msets):
        assert np.array_equal(M[j], T.stop_counts(texts, m)), j
    rows, dic, codes = T.distinct_tokens_by_row(col)
    got: dict[int, set] = {}
    for r, c in zip(rows, codes):
        got.setdefault(int(r), set()).add(dic[int(c)].as_py())
    for i, t in enumerate(texts):
        assert got.get(i, set()) == set(T.whitespace_tokens(t)), i
    rows, dic, codes = T.flat_word_ngrams(col, 3)
    got = {}
    for r, c in zip(rows, codes):
        got.setdefault(int(r), set()).add(dic[int(c)].as_py())
    for i, t in enumerate(texts):
        assert got.get(i, set()) == T.word_ngrams(t, 3), i
    print("parity: OK")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    col = pa.concat_tables([t] * tile).column("text").combine_chunks()
    texts = col.to_pylist()
    nbytes = pc.sum(pc.binary_length(col.cast("binary"))).as_py()
    print(f"{len(texts)} docs, {nbytes/1e6:.1f} MB text")

    _parity(col.slice(0, 2000), texts[:2000])

    def bench(name, old, new, reps=3):
        old(), new()
        t0 = time.perf_counter()
        for _ in range(reps):
            old()
        a = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            new()
        b = (time.perf_counter() - t0) / reps
        print(f"{name:24s} old {a:.3f}s  new {b:.3f}s  -> {a/b:.1f}x")

    bench(
        "token_count(\\w+)",
        lambda: T.count_word_tokens(texts),
        lambda: T.count_word_tokens_arrow(col),
    )

    en = frozenset(T.LANG_MARKERS["en"])

    def old_quality():
        nt = np.empty(len(texts), np.int64)
        ns = np.empty(len(texts), np.int64)
        for i, txt in enumerate(texts):
            toks = txt.split()
            nt[i] = len(toks)
            ns[i] = sum(1 for w in toks if w in en)

    bench(
        "quality(len+stop)",
        old_quality,
        lambda: T.marker_count_matrix(col, [T.LANG_MARKERS["en"]]),
    )

    msets = [(l, frozenset(T.LANG_MARKERS[l])) for l in T.LANG_PRIORITY]

    def old_langid():
        for txt in texts:
            toks = txt.split()
            [sum(1 for w in toks if w in m) for _l, m in msets]

    bench(
        "langid(5 marker sets)",
        old_langid,
        lambda: T.marker_count_matrix(col, [m for _l, m in msets]),
    )

    def old_df():
        df: Counter = Counter()
        tf: Counter = Counter()
        for txt in texts:
            toks = T.whitespace_tokens(txt)
            tf.update(toks)
            df.update(frozenset(toks))

    def new_df():
        flat, row_ids, _n = T.flat_ws_tokens(col)
        enc = flat.dictionary_encode()
        codes = enc.indices.cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        np.bincount(codes, minlength=k)
        ukey = np.unique(row_ids * k + codes)
        np.bincount(ukey % k, minlength=k)

    bench("df_topk partial", old_df, new_df)

    def old_shingles():
        for txt in texts:
            T.word_ngrams(txt, 3)

    bench("ngram shingles", old_shingles, lambda: T.flat_word_ngrams(col, 3))

    def old_simtoks():
        for txt in texts:
            set(T.whitespace_tokens(txt))

    bench(
        "simhash distinct toks",
        old_simtoks,
        lambda: T.distinct_tokens_by_row(col),
    )


if __name__ == "__main__":
    main()
