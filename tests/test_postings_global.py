"""Term-partitioned posting path with salted hot-term splitting
(SURVEY.md §2.B3/§2.B9 — the north star's groupby(term) shape)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from elasticsearch_data_import_handler_ray.functions.codec import decode_posting
from elasticsearch_data_import_handler_ray.index.postings_global import (
    build_term_postings,
    estimate_hot_terms,
    explode_postings,
)
from fixtures.gen_corpus import corpus_files


def test_salted_postings_match_unsalted(tiny_corpus):
    """Postings built with forced hot-term salting decode to exactly the same
    (doc_id, tf) sets as the unsalted build — salting is a pure parallelism
    transform (B9 merge correctness)."""
    t = pa.concat_tables([pq.read_table(f) for f in corpus_files(tiny_corpus)]).slice(0, 300)
    from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch

    doc_ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    src = pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.uint64()), "text": t["content"]}
    )
    ds = ray.data.from_arrow(src)
    rows = explode_postings(ds, analyzer="code", doc_id_col="doc_id", content_col="text")
    rows = rows.materialize()

    # the code analyzer splits "hot_term_3" into hot/term/3 — the actual hot
    # TERMS in the index are "hot" and "term" (df ≈ 97% of docs)
    hot = {"hot", "term"}
    salted = build_term_postings(rows, hot_terms=hot, num_salts=4).to_pandas()
    unsalted = build_term_postings(rows, hot_terms=set()).to_pandas()

    s = salted.set_index("term")
    u = unsalted.set_index("term")
    assert set(s.index) == set(u.index)
    # every hot term present and identical after the salted merge
    for term in sorted(hot & set(s.index)):
        ids_s, tfs_s, _ = decode_posting(s.loc[term, "blob"])
        ids_u, tfs_u, _ = decode_posting(u.loc[term, "blob"])
        assert (ids_s == ids_u).all() and (tfs_s == tfs_u).all(), term
        assert s.loc[term, "df"] == u.loc[term, "df"]
    # spot-check cold terms byte-identical
    cold = [t_ for t_ in list(s.index)[:25] if t_ not in hot]
    for term in cold:
        assert s.loc[term, "blob"] == u.loc[term, "blob"], term


def test_estimate_hot_terms_finds_planted(tiny_corpus):
    t = pa.concat_tables([pq.read_table(f) for f in corpus_files(tiny_corpus)])
    from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch

    doc_ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, type=pa.uint64()), "text": t["content"]})
    )
    rows = explode_postings(ds, analyzer="code", doc_id_col="doc_id", content_col="text")
    hot = estimate_hot_terms(rows.materialize(), hot_threshold=250)
    # the split planted terms "hot"/"term" are in ~97% of 1000 docs
    assert "hot" in hot and "term" in hot


def test_salting_balances_hot_term_partitions(tiny_corpus):
    """Deterministic skew evidence (no timing): with salting, the largest
    per-(term,salt) posting group for a hot term shrinks ~num_salts-fold —
    the straggler partition the north rule requires eliminating (B9)."""
    import pandas as pd

    t = pa.concat_tables([pq.read_table(f) for f in corpus_files(tiny_corpus)])
    from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch

    doc_ids = doc_ids_batch(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), t["commit"].combine_chunks()
    )
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, type=pa.uint64()), "text": t["content"]})
    )
    rows = explode_postings(ds, analyzer="code", doc_id_col="doc_id", content_col="text")
    df = rows.select_columns(["term", "doc_id"]).to_pandas()
    hot_df = int((df.term == "hot").sum())
    assert hot_df > 900  # "hot" is in ~97% of the 1000 docs

    num_salts = 8
    salts = df.loc[df.term == "hot", "doc_id"].astype("uint64") % num_salts
    per_salt = salts.value_counts()
    assert len(per_salt) == num_salts
    # the largest salted sub-group is ~df/num_salts, not df
    assert per_salt.max() < hot_df / num_salts * 1.5


def test_estimate_hot_terms_sees_late_file_skew():
    """The uniform hash-sample must detect a hot term even when ALL its
    occurrences are in the last blocks of the input (the round-1 limit()
    pre-pass only saw the first N rows)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    # 40 cold blocks then 10 blocks saturated with one hot term
    cold = [
        pa.table(
            {
                "doc_id": pa.array(np.arange(b * 500, (b + 1) * 500), type=pa.uint64()),
                "term": pa.array([f"cold_{b}_{i % 50}" for i in range(500)], type=pa.large_string()),
                "tf": pa.array(np.ones(500), type=pa.uint32()),
                "dl": pa.array(np.full(500, 10), type=pa.uint32()),
            }
        )
        for b in range(40)
    ]
    hot = [
        pa.table(
            {
                "doc_id": pa.array(np.arange(100000 + b * 500, 100000 + (b + 1) * 500), type=pa.uint64()),
                "term": pa.array(["lateheat"] * 500, type=pa.large_string()),
                "tf": pa.array(np.ones(500), type=pa.uint32()),
                "dl": pa.array(np.full(500, 10), type=pa.uint32()),
            }
        )
        for b in range(10)
    ]
    ds = ray.data.from_arrow(cold + hot)
    found = estimate_hot_terms(ds, hot_threshold=1000, sample_rate=0.05)
    assert "lateheat" in found          # df 5000, all in the tail
    assert not any(t.startswith("cold_") for t in found)  # df 10 each
