"""HOCON-subset config loader (pipelines/hocon.py) — the reference's config
files were HOCON; parse fidelity + spec e2e through the CLI surface."""

import os

import pytest

from elasticsearch_data_import_handler_ray.pipelines.hocon import (
    HoconError,
    load_config,
)

SF = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_parses_reference_style_config():
    text = """
    # the shape the reference's README shows
    sources = [
      { name = docs, path = "/data/docs.parquet", format = parquet }
    ]
    preps: [
      { name = clicks, source = docs,
        steps = [ { sql = "SELECT * FROM t WHERE event_type = 'click'" } ] }
    ]
    imports = [
      {
        name = docs_index
        source = clicks          // newline-separated entries, no commas
        id_column = doc_id
        sink = index
        target = "/tmp/idx"
        index_num_segments = 4
        index_positions = true
      }
    ]
    """
    d = load_config(text)
    assert d["sources"][0] == {"name": "docs", "path": "/data/docs.parquet", "format": "parquet"}
    assert d["preps"][0]["steps"][0]["sql"].startswith("SELECT")
    imp = d["imports"][0]
    assert imp["index_num_segments"] == 4 and imp["index_positions"] is True
    assert imp["source"] == "clicks"


def test_dotted_keys_merge_and_override():
    d = load_config("a.b = 1\na { c = 2 }\na.b = 3\nx = old\nx = new")
    assert d["a"] == {"b": 3, "c": 2}
    assert d["x"] == "new"


def test_scalars_arrays_comments():
    d = load_config(
        'n = 42\nf = 2.5\nt = true\nz = null\nwords = hello big world\n'
        'arr = [1, 2,\n 3]\ns = "quoted # not comment" # real comment'
    )
    assert d["n"] == 42 and d["f"] == 2.5 and d["t"] is True and d["z"] is None
    assert d["words"] == "hello big world"
    assert d["arr"] == [1, 2, 3]
    assert d["s"] == "quoted # not comment"


def test_json_is_a_valid_subset():
    d = load_config('{"a": {"b": [1, "x"]}, "c": false}'[1:-1])  # bare top level
    assert d == {"a": {"b": [1, "x"]}, "c": False}


def test_unsupported_features_raise():
    with pytest.raises(HoconError, match="substitutions"):
        load_config("a = ${ref.path}")
    with pytest.raises(HoconError, match="include"):
        load_config('include "other.conf"\na = 1')
    with pytest.raises(HoconError):
        load_config("a = [1, 2")  # unterminated


def test_hocon_spec_end_to_end(tmp_path):
    """A .conf pipeline spec runs through the same engine as JSON specs."""
    from elasticsearch_data_import_handler_ray.pipelines.hocon import load_config_file
    from elasticsearch_data_import_handler_ray.pipelines.spec import (
        PipelineSpec,
        run_pipeline,
    )

    out = str(tmp_path / "out")
    conf = tmp_path / "pipe.conf"
    conf.write_text(
        f"""
        sources = [
          {{ name = events, path = "{SF}/events.parquet",
            columns = [event_id, event_type, value] }}
        ]
        imports = [
          {{
            name = clicks_out
            source = events
            id_column = event_id
            sink = parquet
            target = "{out}"
            steps = [ {{ sql = "SELECT event_id, value FROM t WHERE event_type = 'click'" }} ]
          }}
        ]
        """
    )
    spec = PipelineSpec.from_dict(load_config_file(str(conf)))
    results = run_pipeline(spec)
    assert results["clicks_out"]["status"] == "complete", results
    import duckdb
    import ray.data

    got = ray.data.read_parquet(out).count()
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet') WHERE event_type='click'"
    ).fetchone()[0]
    assert got == want
