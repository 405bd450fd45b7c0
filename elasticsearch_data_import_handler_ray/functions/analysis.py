"""Code-aware text analysis (SURVEY.md §2.B1/§2.B7).

The reference shipped documents to Elasticsearch and let ES analyzers tokenize
them; here the analyzer is first-class and runs fully vectorized on Arrow
string arrays with ``pyarrow.compute`` kernels — no per-row Python in the hot
path.

``CodeAnalyzer`` (the default, matching the corpus of source code mandated by
BASELINE.json:15):
  1. camelCase / PascalCase boundaries become spaces
     (``fooBar`` → ``foo Bar``, ``HTTPServer`` → ``HTTP Server``)
  2. lowercase
  3. split on any non ``[a-z0-9_]`` run, then split ``snake_case`` on ``_``
  4. drop empty tokens

``WhitespaceAnalyzer``: lowercase + split on whitespace — SQL-expressible, used
by the DuckDB-oracle-checked term-frequency query (``__ray_entry__.py``).

The SAME analyzer object must process both documents and query text or ranks
diverge (SURVEY.md §2.B7); ``analyze_query`` reuses ``tokens_of``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CAMEL_1 = r"([a-z0-9])([A-Z])"  # fooBar -> foo Bar
_CAMEL_2 = r"([A-Z]+)([A-Z][a-z])"  # HTTPServer -> HTTP Server


class Analyzer:
    """Base: subclasses implement ``tokens_of`` returning a ListArray of tokens."""

    name = "base"

    def tokens_of(self, content: pa.ChunkedArray | pa.Array) -> pa.Array:
        raise NotImplementedError

    def analyze_query(self, text: str) -> list[str]:
        """Tokenize one query string with the exact same kernel pipeline."""
        arr = self.tokens_of(pa.array([text], type=pa.large_string()))
        toks = arr.to_pylist()[0] or []
        return [t for t in toks if t]


class CodeAnalyzer(Analyzer):
    name = "code"

    def tokens_of(self, content):
        s = content
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.replace_substring_regex(s, pattern=_CAMEL_2, replacement=r"\1 \2")
        s = pc.replace_substring_regex(s, pattern=_CAMEL_1, replacement=r"\1 \2")
        s = pc.utf8_lower(s)
        return pc.split_pattern_regex(s, pattern=r"[^a-z0-9]+")


class WhitespaceAnalyzer(Analyzer):
    name = "whitespace"

    def tokens_of(self, content):
        s = content
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.utf8_lower(s)
        return pc.split_pattern_regex(s, pattern=r"\s+")


class UnicodeAnalyzer(Analyzer):
    """Natural-language analyzer: lowercase, split on any non-letter/digit
    (Unicode classes, RE2 ``\\p{L}\\p{N}``) — keeps CJK/accented text
    searchable, which the code analyzer's ascii alphabet drops."""

    name = "unicode"

    def tokens_of(self, content):
        s = content
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.utf8_lower(s)
        return pc.split_pattern_regex(s, pattern=r"[^\p{L}\p{N}]+")


ANALYZERS: dict[str, type[Analyzer]] = {
    CodeAnalyzer.name: CodeAnalyzer,
    WhitespaceAnalyzer.name: WhitespaceAnalyzer,
    UnicodeAnalyzer.name: UnicodeAnalyzer,
}

# ES "stop" filter analogue — fixed English list, deterministic by design
# (affects doc_len exactly as ES's stop filter does)
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)


def _s_stem(v: pa.Array) -> pa.Array:
    """Harman-style "S stemmer" (public: Harman 1991, 'How effective is
    suffixing?'), vectorized as an elif chain of suffix rules — a word is
    claimed by the FIRST suffix that matches; excluded words stay unchanged:
      1. -ies → -y   (unless -aies / -eies)
      2. -es  → -e   (unless -aes / -ees / -oes)
      3. -s   → ∅    (unless -us / -ss)
    Words of ≤3 chars never stem."""
    long_enough = pc.greater(pc.utf8_length(v), 3)
    ies = pc.ends_with(v, pattern="ies")
    ies_ok = pc.and_(
        ies, pc.invert(pc.or_(pc.ends_with(v, pattern="aies"), pc.ends_with(v, pattern="eies")))
    )
    es = pc.ends_with(v, pattern="es")
    es_ok = pc.and_(
        es,
        pc.invert(
            pc.or_(
                pc.or_(pc.ends_with(v, pattern="aes"), pc.ends_with(v, pattern="ees")),
                pc.ends_with(v, pattern="oes"),
            )
        ),
    )
    s = pc.ends_with(v, pattern="s")
    s_ok = pc.and_(
        s, pc.invert(pc.or_(pc.ends_with(v, pattern="us"), pc.ends_with(v, pattern="ss")))
    )
    r_ies = pc.replace_substring_regex(v, pattern="ies$", replacement="y")
    r_es = pc.replace_substring_regex(v, pattern="s$", replacement="")  # -es → -e
    r_s = pc.replace_substring_regex(v, pattern="s$", replacement="")
    not_ies = pc.invert(ies)
    out = pc.if_else(
        pc.and_(long_enough, ies_ok),
        r_ies,
        pc.if_else(
            pc.and_(long_enough, pc.and_(not_ies, es_ok)),
            r_es,
            pc.if_else(
                pc.and_(long_enough, pc.and_(pc.and_(not_ies, pc.invert(es)), s_ok)),
                r_s,
                v,
            ),
        ),
    )
    return out


class FilteredAnalyzer(Analyzer):
    """Token-filter wrapper (the ES analyzer = tokenizer + filters model):
    stopword removal and/or S-stemming on top of any base analyzer. Filters
    are VALUE transforms on the token stream — a stopword becomes "" (the
    shared empty-token drop downstream removes it before positions/doc_len
    are assigned, so phrase adjacency and norms see the filtered stream,
    exactly like ES's stop filter), and stemming rewrites values in place
    (list shape unchanged). Queries share the object, so both sides filter
    identically (§2.B7)."""

    def __init__(self, base: Analyzer, *, stop: bool = False, stem: bool = False):
        self.base = base
        self.stop = stop
        self.stem = stem
        self.name = base.name + ("+stop" if stop else "") + ("+stem" if stem else "")
        self._stopset = pa.array(sorted(STOPWORDS), type=pa.large_string()) if stop else None

    def tokens_of(self, content):
        lst = self.base.tokens_of(content)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        # null token-lists (null content rows) flatten to zero tokens
        lengths_arr = pc.fill_null(pc.list_value_length(lst), 0)
        lengths = lengths_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        v = pc.cast(flat, pa.large_string())
        if self.stop:
            v = pc.if_else(
                pc.is_in(v, value_set=self._stopset), pa.scalar("", type=pa.large_string()), v
            )
        if self.stem:
            v = _s_stem(v)
        return pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), v)


class EdgeNgramAnalyzer(Analyzer):
    """ES ``edge_ngram`` token filter — the search-as-you-type recipe.

    Index side (``tokens_of``): every base token expands to its leading
    prefixes of length ``min_gram``..``min(len, max_gram)`` (a token shorter
    than ``min_gram`` emits nothing — ES's filter without
    ``preserve_original``). Fully vectorized: one ``utf8_length``, one
    ``utf8_slice_codeunits`` per gram length over only the tokens long
    enough, and an O(n) inverse-permutation gather restores token order —
    no per-token Python.

    Query side (``analyze_query``): ES's standard mapping pairs the
    edge_ngram index ``analyzer`` with the BASE ``search_analyzer`` (the
    typed text is already a prefix; expanding it too would match on shared
    first letters). A query token longer than ``max_gram`` simply matches
    nothing — exactly ES's behavior, no silent truncation.

    Divergence note (documented, not hidden): ES emits every gram at the
    source token's position; here grams occupy consecutive positions in the
    stream, so phrase queries over an edge index are not meaningful (they
    aren't in ES's recipe either — match/prefix queries are the use case)
    and ``doc_len`` counts grams (ES norms also count the expanded stream).
    """

    def __init__(self, base: Analyzer, min_gram: int = 1, max_gram: int = 20):
        if not (1 <= min_gram <= max_gram):
            raise ValueError(f"need 1 <= min_gram <= max_gram, got {min_gram}/{max_gram}")
        self.base = base
        self.min_gram = int(min_gram)
        self.max_gram = int(max_gram)
        self.name = f"{base.name}+edge{min_gram}_{max_gram}"

    def tokens_of(self, content):
        lst = self.base.tokens_of(content)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = pc.fill_null(pc.cast(flat, pa.large_string()), "")
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = self.min_gram, self.max_gram
        grams = np.maximum(np.minimum(tok_len, hi) - lo + 1, 0)
        gram_off = np.zeros(len(grams) + 1, dtype=np.int64)
        np.cumsum(grams, out=gram_off[1:])
        total = int(gram_off[-1])
        pieces: list[pa.Array] = []
        spots: list[np.ndarray] = []
        for k in range(lo, hi + 1):
            idx = np.flatnonzero(tok_len >= k)
            if idx.size == 0:
                break  # tok_len >= k is monotone in k: longer grams all empty
            sl = pc.utf8_slice_codeunits(flat.take(pa.array(idx)), start=0, stop=k)
            if isinstance(sl, pa.ChunkedArray):
                sl = sl.combine_chunks()
            pieces.append(sl)
            spots.append(gram_off[idx] + (k - lo))
        if pieces:
            values = pa.concat_arrays(pieces)
            # spots is a permutation of range(total): invert it in O(n)
            inv = np.empty(total, dtype=np.int64)
            inv[np.concatenate(spots)] = np.arange(total, dtype=np.int64)
            values = values.take(pa.array(inv))
        else:
            values = pa.array([], type=pa.large_string())
        ntoks = pc.fill_null(pc.list_value_length(lst), 0)
        ntoks = ntoks.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_off = np.zeros(len(ntoks) + 1, dtype=np.int64)
        np.cumsum(ntoks, out=tok_off[1:])
        doc_off = gram_off[tok_off]
        return pa.LargeListArray.from_arrays(pa.array(doc_off, type=pa.int64()), values)

    def analyze_query(self, text: str) -> list[str]:
        return self.base.analyze_query(text)


class ShingleAnalyzer(Analyzer):
    """ES ``shingle`` token filter — word n-grams over the base token stream.

    For every position p it emits (in ES token-stream order) the unigram
    (unless ``output_unigrams=False``) followed by the shingles of size
    ``min_size``..``max_size`` that START at p, space-joined — e.g. the ES
    default (2,2, unigrams on) turns ``"a b c"`` into
    ``a, "a b", b, "b c", c``. Fully vectorized: empties/nulls are dropped
    first (divergence note: ES can insert ``_`` filler for removed stopwords;
    here the stream closes up — the FilteredAnalyzer's empty-drop semantics),
    then one ``binary_join_element_wise`` per shingle size over
    index-shifted takes of the flat token array, scattered into stream
    order by an O(n) inverse permutation.

    Query side shares the exact same expansion (``analyze_query`` inherits
    ``tokens_of``): a two-word query produces its unigrams + bigram, which
    is exactly how ES scores a match query against a shingled field."""

    def __init__(self, base: Analyzer, min_size: int = 2, max_size: int = 2,
                 output_unigrams: bool = True):
        if not (2 <= min_size <= max_size):
            raise ValueError(f"need 2 <= min_size <= max_size, got {min_size}/{max_size}")
        self.base = base
        self.min_size = int(min_size)
        self.max_size = int(max_size)
        self.output_unigrams = bool(output_unigrams)
        self.name = f"{base.name}+shingle{min_size}_{max_size}" + (
            "" if output_unigrams else "nouni"
        )

    def tokens_of(self, content):
        lst = self.base.tokens_of(content)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = pc.cast(flat, pa.large_string())
        parent = pc.list_parent_indices(lst)
        if isinstance(parent, pa.ChunkedArray):
            parent = parent.combine_chunks()
        keep = pc.and_kleene(pc.is_valid(flat), pc.not_equal(flat, ""))
        keep = pc.fill_null(keep, False)
        flat = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(lst)
        n = len(par)
        counts = np.bincount(par, minlength=n_docs).astype(np.int64)
        doc_tok_start = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=doc_tok_start[1:])
        pos = np.arange(n, dtype=np.int64) - np.repeat(doc_tok_start[:-1], counts)
        remaining = counts[par] - pos
        uni = 1 if self.output_unigrams else 0
        lo, hi = self.min_size, self.max_size
        e = uni + np.maximum(np.minimum(remaining, hi) - lo + 1, 0)
        tok_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(e, out=tok_off[1:])
        total = int(tok_off[-1])
        pieces: list[pa.Array] = []
        spots: list[np.ndarray] = []
        if uni and n:
            pieces.append(flat)
            spots.append(tok_off[:-1])
        for s in range(lo, hi + 1):
            idx = np.flatnonzero(remaining >= s)
            if idx.size == 0:
                break  # remaining >= s is monotone in s
            arrays = [flat.take(pa.array(idx + j)) for j in range(s)]
            joined = pc.binary_join_element_wise(
                *arrays, pa.scalar(" ", type=pa.large_string())
            )
            if isinstance(joined, pa.ChunkedArray):
                joined = joined.combine_chunks()
            pieces.append(joined)
            spots.append(tok_off[idx] + uni + (s - lo))
        if pieces:
            values = pa.concat_arrays([p.cast(pa.large_string()) for p in pieces])
            inv = np.empty(total, dtype=np.int64)
            inv[np.concatenate(spots)] = np.arange(total, dtype=np.int64)
            values = values.take(pa.array(inv))
        else:
            values = pa.array([], type=pa.large_string())
        doc_off = tok_off[doc_tok_start]
        return pa.LargeListArray.from_arrays(pa.array(doc_off, type=pa.int64()), values)


_EDGE_RE = re.compile(r"^edge(?:(\d+)_(\d+))?$")
_SHINGLE_RE = re.compile(r"^shingle(?:(\d+)_(\d+))?(nouni)?$")


def get_analyzer(name: str) -> Analyzer:
    """``"code"`` → base analyzer; ``"code+stop"``, ``"unicode+stop+stem"``
    etc. compose token filters onto the base (order-insensitive suffixes).
    ``"whitespace+edge1_20"`` (or bare ``+edge`` for the 1..20 default) wraps
    the composed analyzer in the edge_ngram filter — applied LAST, like ES's
    filter-chain position for search-as-you-type mappings."""
    parts = name.split("+")
    base = ANALYZERS[parts[0]]()
    flags = set(parts[1:])
    edge: tuple[int, int] | None = None
    shingle: tuple[int, int, bool] | None = None
    for f in list(flags):
        m = _EDGE_RE.match(f)
        if m:
            flags.discard(f)
            edge = (int(m.group(1) or 1), int(m.group(2) or 20))
            continue
        m = _SHINGLE_RE.match(f)
        if m:
            flags.discard(f)
            shingle = (int(m.group(1) or 2), int(m.group(2) or 2), not m.group(3))
    unknown = flags - {"stop", "stem"}
    if unknown:
        raise KeyError(f"unknown analyzer filters: {sorted(unknown)}")
    out: Analyzer = base
    if flags:
        out = FilteredAnalyzer(base, stop="stop" in flags, stem="stem" in flags)
    if shingle is not None:
        out = ShingleAnalyzer(out, min_size=shingle[0], max_size=shingle[1],
                              output_unigrams=shingle[2])
    if edge is not None:
        out = EdgeNgramAnalyzer(out, min_gram=edge[0], max_gram=edge[1])
    return out


def term_frequencies(
    analyzer: Analyzer, doc_ids: pa.Array, content: pa.ChunkedArray | pa.Array
) -> tuple[pa.Table, pa.Table]:
    """Vectorized (doc, term, tf) explosion + per-doc lengths for one batch.

    Returns ``(postings, doclens)`` where postings has columns
    ``doc_id:uint64, term:large_string, tf:uint32`` and doclens has
    ``doc_id:uint64, doc_len:uint32``. Term counting dictionary-encodes the
    flat token array once and lexsorts the int codes — measured ~40% faster
    than Arrow's (doc_id, string) hash group-by at every batch size, and the
    cost stays integer-sort-shaped as vocabulary grows. Same multiset output
    (pinned by the byte-identity build tests).
    """
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    tok_list = analyzer.tokens_of(content)
    flat = pc.list_flatten(tok_list)
    parent = pc.list_parent_indices(tok_list)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(par)
    empty_u64 = pa.array([], type=pa.uint64())
    if n == 0:
        return (
            pa.table(
                {
                    "doc_id": empty_u64,
                    "term": pa.array([], type=pa.large_string()),
                    "tf": pa.array([], type=pa.uint32()),
                }
            ),
            pa.table({"doc_id": empty_u64, "doc_len": pa.array([], type=pa.uint32())}),
        )
    d = pc.cast(flat, pa.large_string()).dictionary_encode()
    codes = np.ascontiguousarray(d.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((codes, par))
    g_par, g_codes = par[order], codes[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (g_par[1:] != g_par[:-1]) | (g_codes[1:] != g_codes[:-1])
    grp = np.flatnonzero(change)
    tf = np.diff(np.append(grp, n))
    # parent indices are ascending, so doc runs give doc lengths directly
    run_start = np.flatnonzero(np.diff(par, prepend=-1))
    run_len = np.diff(np.append(run_start, n))
    postings = pa.table(
        {
            "doc_id": pc.cast(doc_ids.take(pa.array(g_par[grp])), pa.uint64()),
            "term": d.dictionary.take(pa.array(g_codes[grp])),
            "tf": pa.array(tf.astype(np.uint32)),
        }
    )
    doclens = pa.table(
        {
            "doc_id": pc.cast(doc_ids.take(pa.array(par[run_start])), pa.uint64()),
            "doc_len": pa.array(run_len.astype(np.uint32)),
        }
    )
    return postings, doclens


def term_frequencies_positions(
    analyzer: Analyzer, doc_ids: pa.Array, content: pa.ChunkedArray | pa.Array
) -> tuple[pa.Table, pa.Table]:
    """``term_frequencies`` + per-occurrence token positions (§2.B3 positional
    variant). Position = index of the token in the doc's analyzed token stream
    (empties dropped first, so adjacent real tokens are adjacent positions —
    what phrase matching needs).

    Fully vectorized: one dictionary-encode of the flat token array, one
    stable ``np.lexsort`` by (doc row, term code) — stability keeps positions
    ascending within each (doc, term) group — then run-length boundaries give
    (tf, position list) per posting. Same (doc_id, term, tf) multiset as
    ``term_frequencies`` (pinned by tests/test_positions.py).

    Returns ``(postings, doclens)``; postings adds ``pos:large_list<uint32>``.
    """
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    tok_list = analyzer.tokens_of(content)
    flat = pc.list_flatten(tok_list)
    parent = pc.list_parent_indices(tok_list)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(par)
    if n == 0:
        empty_post = pa.table(
            {
                "doc_id": pa.array([], type=pa.uint64()),
                "term": pa.array([], type=pa.large_string()),
                "tf": pa.array([], type=pa.uint32()),
                "pos": pa.array([], type=pa.large_list(pa.uint32())),
            }
        )
        empty_dl = pa.table(
            {"doc_id": pa.array([], type=pa.uint64()), "doc_len": pa.array([], type=pa.uint32())}
        )
        return empty_post, empty_dl
    # position within doc over kept tokens (parent indices are ascending)
    run_start = np.flatnonzero(np.diff(par, prepend=-1))
    run_len = np.diff(np.append(run_start, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(run_start, run_len)

    d = pc.cast(flat, pa.large_string()).dictionary_encode()
    codes = np.ascontiguousarray(d.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((codes, par))  # stable → pos ascending within group
    g_par, g_codes, g_pos = par[order], codes[order], pos[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (g_par[1:] != g_par[:-1]) | (g_codes[1:] != g_codes[:-1])
    grp_start = np.flatnonzero(change)
    tf = np.diff(np.append(grp_start, n))

    offs = pa.array(np.append(grp_start, n), type=pa.int64())
    pos_col = pa.LargeListArray.from_arrays(offs, pa.array(g_pos.astype(np.uint32)))
    postings = pa.table(
        {
            "doc_id": pc.cast(doc_ids.take(pa.array(g_par[grp_start])), pa.uint64()),
            "term": d.dictionary.take(pa.array(g_codes[grp_start])),
            "tf": pa.array(tf.astype(np.uint32)),
            "pos": pos_col,
        }
    )
    doclens = pa.table(
        {
            "doc_id": pc.cast(doc_ids.take(pa.array(par[run_start])), pa.uint64()),
            "doc_len": pa.array(run_len.astype(np.uint32)),
        }
    )
    return postings, doclens
