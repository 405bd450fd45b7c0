"""Fragment highlighting (index/highlight.py + QueryEngine.highlight_fragments).

The load-bearing invariant: token_spans must reproduce the indexing
analyzer's token stream exactly (same tokens, same order, plus true source
offsets) — everything else (tagging, windows) is checked against it.
"""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer
from elasticsearch_data_import_handler_ray.index.highlight import (
    highlight_text,
    token_spans,
)

TRICKY = [
    "parseJSONBuffer fooBar HTTPServer2 camelCase_id x",
    "  leading   spaces\tand\ttabs\nnewlines  ",
    "ABCDef aB a1B __dunder__ snake_case-kebab.dot",
    "UPPER lower MiXeD 123abc456DEF",
    "unicode: café naïve 北京 привет",
    "",
    "punctuation!!! ??? ...",
]


@pytest.mark.parametrize("name", ["code", "whitespace", "unicode", "code+stop+stem"])
@pytest.mark.parametrize("text", TRICKY)
def test_span_tokens_match_analyzer(name, text):
    az = get_analyzer(name)
    spans = token_spans(text, az)
    got = [t for _, _, t in spans if t]
    assert got == az.analyze_query(text)
    # offsets really point at the source (case-insensitively for the base
    # tokenizers; filters may rewrite the value, so only check shape there)
    for s, e, t in spans:
        assert 0 <= s < e <= len(text)


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            min_codepoint=32,
            max_codepoint=600,
            # U+0130 lowercases to TWO codepoints — the documented
            # length-changing-fold divergence in index/highlight.py
            exclude_characters="İ",
        ),
        max_size=80,
    )
)
def test_span_invariant_fuzz(text):
    for name in ("code", "whitespace", "code+stop+stem"):
        az = get_analyzer(name)
        assert [t for _, _, t in token_spans(text, az) if t] == az.analyze_query(text)


def test_highlight_marks_terms():
    az = get_analyzer("whitespace")
    text = "the quick brown fox jumps over the lazy dog"
    frags = highlight_text(text, {"fox", "dog"}, az, fragment_size=200)
    assert len(frags) == 1
    assert "<em>fox</em>" in frags[0] and "<em>dog</em>" in frags[0]


def test_highlight_no_match_returns_empty():
    az = get_analyzer("whitespace")
    assert highlight_text("alpha beta", {"zzz"}, az) == []


def test_highlight_whole_field_mode():
    az = get_analyzer("whitespace")
    text = "alpha beta gamma"
    frags = highlight_text(text, {"beta"}, az, number_of_fragments=0)
    assert frags == ["alpha <em>beta</em> gamma"]


def test_highlight_fragment_count_and_size():
    az = get_analyzer("whitespace")
    words = ["filler%02d" % i for i in range(200)]
    for i in (10, 80, 150):
        words[i] = "needle"
    text = " ".join(words)
    frags = highlight_text(text, {"needle"}, az, fragment_size=60,
                           number_of_fragments=2)
    assert len(frags) == 2
    for f in frags:
        assert "<em>needle</em>" in f
        # tags excluded, fragments stay near the requested size
        assert len(f.replace("<em>", "").replace("</em>", "")) <= 60 + 40


def test_highlight_custom_tags_camelcase():
    az = get_analyzer("code")
    text = "def parseJSONBuffer(data): return data"
    frags = highlight_text(text, {"json"}, az, pre_tag="[", post_tag="]",
                           number_of_fragments=0)
    assert frags == ["def parse[JSON]Buffer(data): return data"]


@pytest.fixture(scope="module")
def hl_engine(sf_dir, tmp_path_factory):
    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig

    idx = str(tmp_path_factory.mktemp("hl") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=2, doc_id_col="doc_id",
            content_col="text", store_cols=("text",),
        ),
    )
    eng = QueryEngine(idx)
    yield eng
    eng.close()


def test_engine_highlight_fragments(hl_engine):
    hits = hl_engine.search("hash join", k=5)
    assert hits
    frags = hl_engine.highlight_fragments("hash join", [d for d, _ in hits])
    assert frags
    for d, fs in frags.items():
        assert any("<em>" in f for f in fs)
        for f in fs:
            stripped = f.replace("<em>", "").replace("</em>", "")
            # every fragment is a literal substring of the stored source
            src = hl_engine._stored_texts([d])[d]
            assert stripped in src


def test_engine_query_string_fragments(hl_engine):
    out = hl_engine.query_string_highlight_fragments("hash AND join", k=5)
    assert out
    for d, s, fs in out:
        assert s > 0
        assert any("<em>hash</em>" in f or "<em>join</em>" in f for f in fs)


def test_engine_fragments_need_stored_source(sf_dir, tmp_path_factory):
    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig

    idx = str(tmp_path_factory.mktemp("hl_nostore") / "idx")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        mode="full",
        config=IndexConfig(
            analyzer="whitespace", num_segments=2, doc_id_col="doc_id",
            content_col="text",
        ),
    )
    eng = QueryEngine(idx)
    try:
        hits = eng.search("hash", k=3)
        with pytest.raises(ValueError, match="store_cols"):
            eng.highlight_fragments("hash", [d for d, _ in hits])
    finally:
        eng.close()
