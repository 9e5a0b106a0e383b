"""Text-analysis kernels for the training-data pipeline operators:
language-ID (marker-word heuristic), quality scoring, token counting,
fingerprinting, shingling.  Every kernel has an exact DuckDB-SQL twin
(see pipelines/queries.py ORACLE_SQL) — outputs are integers or md5
strings so cross-engine value hashes match exactly.

These go beyond the reference's operator set (it has no text ops) per
the build brief: first-class large-scale training-data operators.
"""

from __future__ import annotations

import re

import numpy as np

# \w+ with ASCII semantics == DuckDB (RE2) '\w+' on ASCII text.
WORD_RE = re.compile(r"\w+", re.ASCII)

# Marker stopwords per language for the heuristic language-ID.  Scoring
# counts *occurrences* of marker words among whitespace tokens; the
# prediction is the first language (in LANG_PRIORITY order) achieving
# the max score.  Deliberately tiny so the SQL twin stays readable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "es": ("el", "la", "que", "de", "los", "una"),
    "fr": ("le", "les", "et", "des", "une", "est"),
    "zh": ("de", "shi", "bu", "le", "wo", "zai"),
}
LANG_PRIORITY = ("en", "de", "es", "fr", "zh")

QUALITY_MIN_TOKENS = 20
QUALITY_MIN_STOP_X100 = 2  # quality needs n_stop*100 >= 2*n_tokens (>=2% stopwords)


def whitespace_tokens(text: str) -> list[str]:
    """Split on runs of whitespace — DuckDB twin:
    ``string_split_regex(text, '\\s+')`` (empty strings excluded)."""
    return [t for t in re.split(r"\s+", text) if t]


def word_tokens(text: str) -> list[str]:
    return WORD_RE.findall(text)


def count_word_tokens(texts) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    findall = WORD_RE.findall
    for i, t in enumerate(texts):
        out[i] = len(findall(t))
    return out


def stop_counts(texts, markers: tuple[str, ...]) -> np.ndarray:
    """Occurrences of marker words among whitespace tokens."""
    mset = frozenset(markers)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = sum(1 for w in t.split() if w in mset)
    return out


def langid_scores(text: str) -> dict[str, int]:
    toks = text.split()
    return {
        lang: sum(1 for w in toks if w in mset)
        for lang, mset in ((l, frozenset(m)) for l, m in LANG_MARKERS.items())
    }


def predict_lang(text: str) -> str:
    scores = langid_scores(text)
    best = max(scores[l] for l in LANG_PRIORITY)
    for lang in LANG_PRIORITY:
        if scores[lang] == best:
            return lang
    return "en"


def word_ngrams(text: str, n: int = 3) -> set[str]:
    """Distinct word n-gram shingles (space-joined).  DuckDB twin:
    ``list_transform(range(1, len(w)-n+2), i -> w[i]||' '||...)`` over
    ``string_split_regex(text,'\\s+')``."""
    w = whitespace_tokens(text)
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
