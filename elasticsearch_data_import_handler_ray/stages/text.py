"""Text-analysis stages for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All vectorized
(pyarrow.compute RE2 kernels / numpy); stateful pieces (compiled vocabularies)
live in callable classes → actor pools.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import pa_round_half_away

# tiny per-language stopword lists for the n-gram/stopword langid heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "que", "de", "en", "una", "por", "con"],
}


def token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per row — one vectorized RE2 scan."""
    n = pc.count_substring_regex(t[text_col], pattern=r"\S+")
    return t.append_column("n_tokens", pc.cast(n, pa.int64()))


# GPT-2-style pretokenizer pattern (RE2-compatible subset: no lookahead);
# identical string is used in the DuckDB oracle so counts match exactly
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish pretoken count per row (one vectorized RE2 scan) — the
    'how many LLM tokens is this corpus' estimator."""
    n = pc.count_substring_regex(t[text_col], pattern=BPE_PATTERN)
    return t.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def quality_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: length, token count, punctuation ratio, stopword ratio.
    Ratios are rounded to 4 decimals (both here and in the SQL oracle) so the
    driver's value hash is insensitive to last-ulp differences."""
    text = t[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, pattern=r"\S+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern=r"[^\w\s]"), pa.int64())
    n_stop = pc.cast(
        pc.count_substring_regex(
            pc.utf8_lower(text), pattern=r"\b(the|and|of|to|in|is)\b"
        ),
        pa.int64(),
    )
    punct_ratio = pa_round_half_away(
        pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())),
        4,
    )
    stop_ratio = pa_round_half_away(
        pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())),
        4,
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
        }
    )


class LangId:
    """Stopword-hit language ID — stateful stage: the per-language RE2
    patterns are compiled once per actor in __init__ (BASELINE.json:15
    actor-pool requirement), scored vectorized per batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(_LANG_STOPWORDS)
        self.patterns = {
            lang: r"\b(" + "|".join(_LANG_STOPWORDS[lang]) + r")\b" for lang in self.langs
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t[self.text_col])
        counts = np.stack(
            [
                pc.count_substring_regex(low, pattern=self.patterns[lang])
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for lang in self.langs
            ]
        )
        best = counts.argmax(axis=0)  # ties → first (sorted lang order), deterministic
        none = counts.max(axis=0) == 0
        pred = np.array(self.langs, dtype=object)[best]
        pred[none] = "unknown"
        return t.append_column("predicted_lang", pa.array(pred, type=pa.string()))


def fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of whitespace-normalized lowercased text —
    exactly reproducible in SQL (md5(regexp_replace(lower(text),'\\s+',' ','g')))
    so the oracle can check it, and stable across runs/partitionings."""
    norm = pc.replace_substring_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+", replacement=" ")
    fps = [hashlib.md5(v.encode()).hexdigest() for v in norm.to_pylist()]
    return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps, type=pa.string())})


def chunk_batch(
    t: pa.Table, text_col: str = "text", *, size: int = 400, stride: int = 300
) -> pa.Table:
    """Document chunking for training pipelines: split each doc into windows
    of ``size`` chars every ``stride`` chars (overlapping when size>stride).
    1 doc row → ceil(len/stride) chunk rows; empty docs emit nothing. The
    loop below is over CHUNK ORDINALS (bounded by the longest doc in the
    batch), with every iteration a vectorized slice over all docs long
    enough — never a per-row loop. SQL-equivalent:
    unnest(generate_series) + substring (see oracle)."""
    text = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    n_chunks = np.where(lens > 0, (lens + stride - 1) // stride, 0).astype(np.int64)
    max_n = int(n_chunks.max()) if len(n_chunks) else 0
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    out_id, out_idx, out_chunk = [], [], []
    for i in range(max_n):
        m = n_chunks > i
        sel = pa.array(m)
        sliced = pc.utf8_slice_codeunits(text.filter(sel), start=i * stride, stop=i * stride + size)
        out_id.append(ids[m])
        out_idx.append(np.full(int(m.sum()), i, dtype=np.int64))
        out_chunk.append(sliced)
    if not out_id:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "chunk_idx": pa.array([], type=pa.int64()),
             "chunk": pa.array([], type=pa.string())}
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            "chunk_idx": pa.array(np.concatenate(out_idx), type=pa.int64()),
            "chunk": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_chunk]),
        }
    )


def redact_batch(
    t: pa.Table,
    text_col: str = "text",
    *,
    pattern: str = r"\b[\w.+-]+@[\w-]+\.[\w.]+\b",
    replacement: str = "<REDACTED>",
) -> pa.Table:
    """PII-style scrubbing: replace every regex match (emails by default)
    with a placeholder — one vectorized RE2 pass. Same RE2 engine as
    DuckDB's regexp_replace(..., 'g'), so the oracle reproduces it exactly."""
    red = pc.replace_substring_regex(t[text_col], pattern=pattern, replacement=replacement)
    return pa.table({"doc_id": t["doc_id"], "redacted": red})


def repetition_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Repetition-ratio quality signal: 1 - distinct_tokens/total_tokens per
    doc (space-split, matching SQL string_split(text,' ')). The distinct
    count runs as one pandas drop_duplicates over (doc, token) — vectorized
    C, no per-row set building."""
    import pandas as pd

    text = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
    toks = pc.split_pattern(text, pattern=" ")
    n_tok = pc.cast(pc.list_value_length(toks), pa.int64()).to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    uniq = pd.DataFrame({"p": parent, "t": flat}).drop_duplicates()
    n_uniq = np.zeros(len(t), dtype=np.int64)
    cnt = uniq.groupby("p", sort=False).size()
    n_uniq[cnt.index.to_numpy()] = cnt.to_numpy()
    ratio = 1.0 - n_uniq / np.maximum(n_tok, 1)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tok": pa.array(n_tok, type=pa.int64()),
            "n_uniq": pa.array(n_uniq, type=pa.int64()),
            "rep_ratio": pa_round_half_away(pa.array(ratio, type=pa.float64()), 6),
        }
    )


def sha256_batch_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row sha256 (the A22/BASELINE.json:15 invariant op, SQL-checkable)."""
    shas = [hashlib.sha256(v.encode()).hexdigest() for v in t[text_col].to_pylist()]
    return pa.table({"doc_id": t["doc_id"], "sha256": pa.array(shas, type=pa.string())})


# ------------------------------------------------------------ sequence packing
def _pack_group(g, budget: int):
    """Next-fit greedy over ONE hash bucket's docs in doc_id order: append to
    the open sequence while the token budget holds, else start a new one; a
    doc longer than the budget gets its own (overlong) sequence — splitting
    is the trainer's choice, not the packer's. The per-doc Python loop is
    bounded by the bucket size (data-proportional fan-out), and greedy
    packing is inherently sequential — this is the documented exception to
    the no-row-loops rule."""
    import pandas as pd

    g = g.sort_values("doc_id", kind="mergesort")
    toks = g["n_tokens"].to_numpy()
    seq = np.empty(len(g), dtype=np.int64)
    pos = np.empty(len(g), dtype=np.int64)
    cur, fill, p = 0, 0, 0
    for i, n in enumerate(toks.tolist()):
        if fill > 0 and fill + n > budget:
            cur, fill, p = cur + 1, 0, 0
        seq[i], pos[i] = cur, p
        fill += int(n)
        p += 1
    out = g.assign(seq=seq, pos=pos)
    out["seq_id"] = out["bucket"].astype(str) + "-" + out["seq"].astype(str)
    return out[["seq_id", "pos", "doc_id", "n_tokens"]]


def pack_sequences(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    num_buckets: int | None = None,
):
    """Sequence packing for LLM training: assign each document to a training
    sequence so that per-sequence whitespace-token totals stay ≤ ``budget``
    (next-fit greedy in doc_id order inside hash buckets; packing never
    crosses a bucket, so the operator distributes as ONE bounded-group
    shuffle). → rows (seq_id, pos, doc_id, n_tokens).

    Scale shape: token counting is one vectorized RE2 scan per batch; the
    shuffle carries 3 int64s + a small string per doc; a bucket's group is
    1/fanout of the corpus' ID ROWS (not its text), with fanout growing with
    the data (functions/partitioning.shuffle_fanout)."""
    from ..functions.partitioning import shuffle_fanout

    if num_buckets is None:
        num_buckets = shuffle_fanout(ds)

    def prep(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t[text_col], pattern=r"\S+"), pa.int64())
        ids = pc.cast(t[id_col], pa.int64())
        bucket = pa.array(
            ids.to_numpy(zero_copy_only=False) % num_buckets, type=pa.int32()
        )
        return pa.table({"bucket": bucket, "doc_id": ids, "n_tokens": n})

    rows = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return rows.groupby("bucket").map_groups(
        lambda g: _pack_group(g, budget), batch_format="pandas"
    )


# --------------------------------------------------------- keyword extraction
def keyword_extract(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
):
    """Per-document keyword extraction by tf·idf (the ES significant-text /
    tagging shape): → (doc_id, term, score), the ``top_n`` highest
    tf·ln(N/df) terms per doc (ties → term asc).

    Two passes, both bounded: (1) document frequencies via per-batch
    DISTINCT (doc, term) partials → groupby(term).sum — one row per distinct
    term per batch rides the shuffle; (2) the (term → df) map broadcasts via
    ray.put (vocabulary-sized — same cap rationale as BPE's word dict) and
    every batch scores + cuts its own docs locally. No corpus-sized
    materialization anywhere."""
    import ray
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""
        pairs = pd.DataFrame({"d": parent[keep], "term": words[keep]}).drop_duplicates()
        vc = pairs["term"].value_counts()
        n_docs = pairs["d"].nunique()
        out = pa.table(
            {"term": pa.array(vc.index.astype(str)), "df": pa.array(vc.to_numpy(), type=pa.int64())}
        )
        # sentinel row carries this batch's doc count (term "" is impossible)
        return pa.concat_tables(
            [out, pa.table({"term": pa.array([""]), "df": pa.array([n_docs], type=pa.int64())})]
        )

    agg = (
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    import ray as _ray

    tbl = pa.concat_tables([b for b in _ray.get(agg.to_arrow_refs())])
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_pylist()
    n_total = 0
    df_map = {}
    for t_, d_ in zip(terms, dfs):
        if t_ == "":
            n_total += int(d_)
        else:
            df_map[t_] = int(d_)
    ref = _ray.put((df_map, float(n_total)))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
             "score": pa.array([], pa.float64())}
        )
        if len(t) == 0:
            return empty
        import pandas as pd

        df_map, N = ray.get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""
        g = (
            pd.DataFrame({"d": parent[keep], "term": words[keep]})
            .groupby(["d", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        if g.empty:
            return empty
        dfv = g["term"].map(df_map).to_numpy(dtype=np.float64)
        g["score"] = g["tf"].to_numpy(dtype=np.int64) * np.log(N / dfv)
        g = g.sort_values(["d", "score", "term"], ascending=[True, False, True], kind="mergesort")
        g = g.groupby("d", sort=False).head(top_n)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[g["d"].to_numpy()].astype(np.int64)),
                "term": pa.array(g["term"].astype(str)),
                "score": pa.array(g["score"].to_numpy(), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
