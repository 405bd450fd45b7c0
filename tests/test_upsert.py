"""Upsert semantics: id-mapped re-import, latest run wins (index/tombstones.py).

The reference's `es.mapping.id` made every re-import an upsert. Here a doc_id
re-imported by a later incremental run supersedes the earlier version:
queries must behave EXACTLY as if only the latest versions were indexed
(rank- and score-identical to the oracle over the latest corpus), and merge
must purge the old versions physically (byte-identical to a full build over
the latest corpus)."""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_import_handler_ray.functions.analysis import CodeAnalyzer
from elasticsearch_data_import_handler_ray.functions.hashing import doc_ids_batch
from elasticsearch_data_import_handler_ray.index.build import build_index, verify_hashes
from elasticsearch_data_import_handler_ray.index.fsck import verify_index
from elasticsearch_data_import_handler_ray.index.merge import merge_index
from elasticsearch_data_import_handler_ray.index.oracle import BM25Oracle
from elasticsearch_data_import_handler_ray.index.query import QueryEngine
from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig
from fixtures.gen_corpus import corpus_files, generate_corpus

N_DOCS = 500
N_UPD = 60
MARK = "upserted marker token"


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """base corpus (2 files), an update file re-importing the first 60 docs
    with changed content, and the equivalent 'latest' corpus + sidecar."""
    root = tmp_path_factory.mktemp("upsert")
    base = str(root / "base")
    generate_corpus(N_DOCS, base, seed=7, min_tokens=20, max_tokens=120, n_files=2)
    f0, f1 = corpus_files(base)

    t0 = pq.read_table(f0)
    upd = t0.slice(0, N_UPD)
    new_content = pc.binary_join_element_wise(
        upd["content"].combine_chunks(),
        pa.scalar(MARK, type=pa.large_string()),
        pa.scalar(" ", type=pa.large_string()),
    )
    upd = upd.set_column(upd.schema.get_field_index("content"), "content", new_content)
    upd_file = str(root / "update.parquet")
    pq.write_table(upd, upd_file)

    latest_dir = str(root / "latest")
    os.makedirs(latest_dir)
    latest0 = pa.concat_tables([upd, t0.slice(N_UPD)])
    pq.write_table(latest0, os.path.join(latest_dir, "corpus-0000.parquet"))
    shutil.copy(f1, os.path.join(latest_dir, "corpus-0001.parquet"))

    latest = pa.concat_tables([latest0, pq.read_table(f1)])
    doc_ids = doc_ids_batch(
        latest["repo"].combine_chunks(),
        latest["path"].combine_chunks(),
        latest["commit"].combine_chunks(),
    )
    shas = [
        hashlib.sha256(v.encode()).hexdigest()
        for v in latest["content"].combine_chunks().to_pylist()
    ]
    sidecar = str(root / "latest_sha256.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.uint64()),
                "sha256": pa.array(shas, type=pa.string()),
            }
        ),
        sidecar,
    )
    return {
        "base_files": [f0, f1],
        "upd_file": upd_file,
        "latest_dir": latest_dir,
        "latest_table": latest,
        "latest_doc_ids": doc_ids,
        "sidecar": sidecar,
        "upd_doc_ids": np.sort(np.asarray(doc_ids[:N_UPD], dtype=np.uint64)),
    }


@pytest.fixture(scope="module")
def upserted_index(corpora, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "ups")
    build_index(
        corpora["base_files"], idx, mode="full",
        config=IndexConfig(analyzer="code", num_segments=4),
    )
    res = build_index(
        corpora["base_files"] + [corpora["upd_file"]], idx, mode="incremental"
    )
    assert res.n_docs == N_UPD  # only the update file was pending
    return idx


@pytest.fixture(scope="module")
def latest_oracle(corpora):
    t = corpora["latest_table"]
    return BM25Oracle(
        CodeAnalyzer(), corpora["latest_doc_ids"], t["content"].combine_chunks()
    )


QUERIES = [
    ("upserted marker", "or"),
    ("hot_term_0 parse json", "or"),
    ("hot_term_1 hot_term_2", "and"),
    ("load http conf marker", "or"),
    ("foo bar", "or"),
]


def test_upsert_stats_match_latest(upserted_index, latest_oracle):
    eng = QueryEngine(upserted_index)
    try:
        assert eng.N == latest_oracle.N == N_DOCS
        assert eng.avgdl == pytest.approx(latest_oracle.avgdl, rel=0, abs=0)
        # df of the marker token = exactly the updated docs; df of common
        # terms corrected for the superseded versions
        for t in ["upserted", "marker", "hot_term_0", "parse"]:
            assert int(eng.global_dfs([t])[0]) == latest_oracle.df(t), t
    finally:
        eng.close()


@pytest.mark.parametrize("method", ["exhaustive", "bmw"])
def test_upsert_rank_identical(upserted_index, latest_oracle, method):
    eng = QueryEngine(upserted_index)
    try:
        for text, mode in QUERIES:
            got = eng.search(text, k=10, mode=mode, method=method)
            want = latest_oracle.search(text, k=10, mode=mode)
            assert got == [(d, s) for d, s in want], (method, text, mode)
    finally:
        eng.close()


def test_upsert_resolve_and_facets_see_latest_only(upserted_index, corpora):
    eng = QueryEngine(upserted_index)
    try:
        d0 = int(corpora["upd_doc_ids"][0])
        rows = eng.resolve([d0])
        assert len(rows) == 1  # ONE identity row, not old+new
        want_sha = (
            pq.read_table(corpora["sidecar"])
            .filter(pc.equal(pc.field("doc_id"), pa.scalar(d0, type=pa.uint64())))["sha256"][0]
            .as_py()
        )
        assert rows["sha256"].iloc[0] == want_sha
        # every matching doc counted once: total facet mass == df of marker
        fac = eng.facets("upserted", "repo", top=10**6)
        assert sum(n for _, n in fac) == int(eng.global_dfs(["upserted"])[0])
    finally:
        eng.close()


def test_upsert_verify_hashes_latest(upserted_index, corpora):
    assert verify_hashes(upserted_index, corpora["sidecar"]) == N_DOCS


def test_upsert_fsck_explains_duplicates(upserted_index):
    rep = verify_index(upserted_index)
    assert rep["n_superseded"] == N_UPD
    assert rep["n_docs"] == N_DOCS


def test_upsert_merge_purges_to_latest_bytes(upserted_index, corpora, latest_oracle, tmp_path_factory):
    """After merge the index is byte-identical to a full build over only the
    latest versions — the strongest possible statement of upsert purge."""
    merge_index(upserted_index)
    rep = verify_index(upserted_index)
    assert rep["n_superseded"] == 0 and rep["n_docs"] == N_DOCS

    full_idx = str(tmp_path_factory.mktemp("idx") / "latest_full")
    build_index(
        corpora["latest_dir"], full_idx, mode="full",
        config=IndexConfig(analyzer="code", num_segments=4),
    )

    from elasticsearch_data_import_handler_ray.state.manifest import Manifest

    man_m = Manifest.load(upserted_index)
    man_f = Manifest.load(full_idx)
    assert man_m.n_docs == man_f.n_docs and man_m.sum_dl == man_f.sum_dl
    for s in range(4):
        dm = man_m.segment_dirs(s)
        df_ = man_f.segment_dirs(s)
        assert len(dm) == 1 and len(df_) == 1
        with open(os.path.join(dm[0], "postings.bin"), "rb") as a, open(
            os.path.join(df_[0], "postings.bin"), "rb"
        ) as b:
            assert a.read() == b.read(), f"seg {s} postings differ"
        ta = pq.read_table(os.path.join(dm[0], "terms.parquet"))
        tb = pq.read_table(os.path.join(df_[0], "terms.parquet"))
        assert ta.equals(tb), f"seg {s} dictionaries differ"

    # queries on the merged index still match the latest oracle
    eng = QueryEngine(upserted_index)
    try:
        for text, mode in QUERIES:
            got = eng.search(text, k=10, mode=mode, method="exhaustive")
            want = latest_oracle.search(text, k=10, mode=mode)
            assert got == [(d, s) for d, s in want], (text, mode)
    finally:
        eng.close()


def test_upsert_phrase_positional(tmp_path_factory):
    """Positional upsert: a phrase present only in the OLD version of a doc
    must stop matching; a phrase only in the NEW version must match."""
    root = tmp_path_factory.mktemp("ph")
    mk = lambda i, text: {"doc_id": i, "text": text}
    v1 = pa.Table.from_pylist(
        [
            mk(1, "alpha beta gamma old secret phrase here"),
            mk(2, "unrelated words entirely"),
            mk(3, "old secret phrase also lives here"),
        ]
    )
    v2 = pa.Table.from_pylist([mk(1, "alpha beta gamma new shiny phrase here")])
    f1, f2 = str(root / "v1.parquet"), str(root / "v2.parquet")
    pq.write_table(v1, f1)
    pq.write_table(v2, f2)
    idx = str(root / "idx")
    cfg = IndexConfig(
        analyzer="code", num_segments=2, doc_id_col="doc_id", content_col="text",
        positions=True,
    )
    build_index([f1], idx, mode="full", config=cfg)
    build_index([f1, f2], idx, mode="incremental")
    eng = QueryEngine(idx)
    try:
        hits = eng.search("old secret phrase", k=10, mode="phrase")
        assert [d for d, _ in hits] == [3]  # doc 1's old version is dead
        hits = eng.search("new shiny phrase", k=10, mode="phrase")
        assert [d for d, _ in hits] == [1]
        # highlight must come from the live version only
        h = eng.highlight("shiny", [1])
        assert h[1]["shiny"] == [4]
    finally:
        eng.close()
    # merge a positional upsert, then re-check
    merge_index(idx)
    eng = QueryEngine(idx)
    try:
        assert [d for d, _ in eng.search("old secret phrase", k=10, mode="phrase")] == [3]
        assert [d for d, _ in eng.search("new shiny phrase", k=10, mode="phrase")] == [1]
    finally:
        eng.close()
