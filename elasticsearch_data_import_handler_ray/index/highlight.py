"""Snippet-text highlighting — ES's *plain highlighter* shape.

ES's plain highlighter re-analyzes the stored ``_source`` text of each HIT
(not the corpus) and wraps matched term occurrences in ``pre_tag``/
``post_tag`` inside ~``fragment_size``-char fragments.  This module does the
same over this repo's stored doc-values: ``token_spans`` re-tokenizes one
doc's text with CHARACTER offsets using span rules proven identical to the
indexing analyzers (tests pin ``[tok for .. if tok] ==
analyzer.analyze_query(text)``), then ``highlight_text`` assembles tagged
fragments.

Scale shape: highlighting touches only the k returned hits (ES semantics),
so this is bounded driver-side work per query — the corpus is never re-read
(doc text comes from the index's stored columns via ``QueryEngine.resolve``).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.analysis import STOPWORDS, Analyzer, FilteredAnalyzer, _s_stem

__all__ = ["token_spans", "highlight_text"]

# character-level boundary equivalents of analysis._CAMEL_1/_CAMEL_2 — the
# replacement regexes insert a space at exactly these zero-width positions,
# so cutting the original word here reproduces the analyzer's token stream
# with true source offsets (the replace-based kernel loses them).
_CAMEL_CUT_1 = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
_CAMEL_CUT_2 = re.compile(r"(?<=[A-Z])(?=[A-Z][a-z])")
_WORD = re.compile(r"[A-Za-z0-9]+")
# RE2's \s is ASCII [\t\n\f\r ] — Python's unicode \s also eats \x85/\xa0
# etc., which the indexing analyzer keeps as token chars; spell it out so
# the span stream matches the index exactly.
_WS_TOKEN = re.compile(r"[^\t\n\x0b\x0c\r ]+")
_UNI_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)  # == RE2 [\p{L}\p{N}]+

# Known divergence (documented, not handled): codepoints whose lowercasing
# CHANGES STRING LENGTH (e.g. U+0130 İ → "i" + combining dot) can make the
# vectorized analyzer emit a token this offset-preserving span tokenizer
# cannot place.  Source code does not contain these in identifiers; the
# fragment for such a doc may simply miss that one match.


def token_spans(text: str, analyzer: Analyzer) -> list[tuple[int, int, str]]:
    """(start, end, filtered_token) for every token of ``text``.

    ``filtered_token`` is the token AFTER the analyzer's filters (stopwords
    become "", stemming rewrites the value) — i.e. exactly the term the
    index stores — while start/end stay source-text offsets for tagging.
    """
    base = analyzer.base if isinstance(analyzer, FilteredAnalyzer) else analyzer
    spans: list[tuple[int, int, str]] = []
    if base.name == "whitespace":
        for m in _WS_TOKEN.finditer(text):
            spans.append((m.start(), m.end(), m.group().lower()))
    elif base.name == "unicode":
        for m in _UNI_TOKEN.finditer(text):
            spans.append((m.start(), m.end(), m.group().lower()))
    elif base.name == "code":
        for m in _WORD.finditer(text):
            w, s0 = m.group(), m.start()
            cuts = sorted(
                {c.start() for c in _CAMEL_CUT_1.finditer(w)}
                | {c.start() for c in _CAMEL_CUT_2.finditer(w)}
            )
            prev = 0
            for c in cuts + [len(w)]:
                if c > prev:
                    spans.append((s0 + prev, s0 + c, w[prev:c].lower()))
                prev = c
    else:
        raise ValueError(f"no span tokenizer for analyzer {base.name!r}")

    if isinstance(analyzer, FilteredAnalyzer) and spans:
        toks = [t for _, _, t in spans]
        if analyzer.stop:
            toks = ["" if t in STOPWORDS else t for t in toks]
        if analyzer.stem:
            stemmed = _s_stem(pa.array(toks, type=pa.large_string())).to_pylist()
            toks = [s if t else "" for t, s in zip(toks, stemmed)]
        spans = [(s, e, t) for (s, e, _), t in zip(spans, toks)]
    return spans


def _snap(text: str, pos: int, lo: int, hi: int, forward: bool) -> int:
    """Move a fragment edge off mid-token onto whitespace within [lo, hi]."""
    if pos <= 0 or pos >= len(text):
        return max(0, min(pos, len(text)))
    step = 1 if forward else -1
    p = pos
    while lo < p < hi and p < len(text) and not text[p].isspace() and not text[p - 1].isspace():
        p += step
    return p


def highlight_text(
    text: str,
    terms: set[str] | list[str],
    analyzer: Analyzer,
    *,
    fragment_size: int = 100,
    number_of_fragments: int = 5,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> list[str]:
    """Marked-up fragments for one doc (ES plain highlighter semantics).

    ``terms`` are ANALYZED query terms (what the index matched on).
    ``number_of_fragments=0`` returns the whole field as one tagged fragment
    (the ES convention).  Fragments are scored by match count and returned
    in source order (ES's default sort).
    """
    termset = set(terms)
    spans = token_spans(text, analyzer)
    matched = [(s, e) for s, e, t in spans if t and t in termset]
    if not matched:
        return []

    def tag(lo: int, hi: int) -> str:
        parts: list[str] = []
        pos = lo
        for s, e in matched:
            if s < lo or e > hi:
                continue
            parts.append(text[pos:s])
            parts.append(pre_tag)
            parts.append(text[s:e])
            parts.append(post_tag)
            pos = e
        parts.append(text[pos:hi])
        return "".join(parts)

    if number_of_fragments == 0:
        return [tag(0, len(text))]

    # greedy windows: anchor a fragment a quarter-size before its first
    # match, absorb every following match that still fits, snap edges to
    # whitespace so no token (matched or not) is cut mid-way.
    frags: list[tuple[int, int, int]] = []  # (start, end, n_matches)
    i = 0
    while i < len(matched):
        s0, e0 = matched[i]
        start = max(0, s0 - max(0, (fragment_size - (e0 - s0))) // 4)
        end = min(len(text), start + fragment_size)
        n = 0
        j = i
        while j < len(matched) and matched[j][1] <= end:
            n += 1
            j += 1
        if n == 0:  # single match longer than fragment_size: keep it whole
            end = e0
            n, j = 1, i + 1
        start = _snap(text, start, max(0, start - 32), matched[i][0], forward=True)
        end = _snap(text, end, matched[j - 1][1], min(len(text), end + 32), forward=False)
        frags.append((start, end, n))
        i = j

    top = sorted(frags, key=lambda f: (-f[2], f[0]))[:number_of_fragments]
    top.sort(key=lambda f: f[0])
    return [tag(s, e) for s, e, _ in top]
