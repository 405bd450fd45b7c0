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
    with pytest.raises(HoconError, match="unresolved substitution"):
        load_config("a = ${no.such.path}")
    with pytest.raises(HoconError, match="include"):
        load_config('include "other.conf"\na = 1')
    with pytest.raises(HoconError):
        load_config("a = [1, 2")  # unterminated


def test_braced_root():
    # legal Typesafe Config — and therefore every plain JSON object document
    assert load_config("{ a = 1 }") == {"a": 1}
    assert load_config('{"a": {"b": [1, 2]}, "c": "x"}') == {
        "a": {"b": [1, 2]}, "c": "x",
    }
    assert load_config("\n# comment\n{ a { b = 2 } }\n") == {"a": {"b": 2}}
    with pytest.raises(HoconError, match="trailing content"):
        load_config("{ a = 1 } b = 2")


def test_substitutions_basic():
    cfg = load_config("base = /data\nout = ${base}\nn = ${k}\nk = 3")
    assert cfg == {"base": "/data", "out": "/data", "n": 3, "k": 3}


def test_substitutions_concat():
    cfg = load_config(
        'host = db1\nport = 5432\nurl = "jdbc:"${host}":"${port}\n'
        "dir = ${host}/data\ngreet = hello ${host} world"
    )
    assert cfg["url"] == "jdbc:db1:5432"
    assert cfg["dir"] == "db1/data"
    assert cfg["greet"] == "hello db1 world"


def test_substitutions_optional_and_env(monkeypatch):
    cfg = load_config("a = ${?missing.key}\nb = 1")
    assert cfg == {"b": 1}  # missing ${?x} removes the key
    cfg = load_config('pre = x\nv = ${pre}${?missing.key}"y"')
    assert cfg["v"] == "xy"  # missing ${?x} is empty inside a concat
    monkeypatch.setenv("EDIH_TEST_SUB", "from_env")
    assert load_config("a = ${EDIH_TEST_SUB}")["a"] == "from_env"


def test_substitutions_forward_ref_object_and_array():
    cfg = load_config("a = ${later.x}\nlater { x = [1, ${later.y}] }\nlater.y = 7")
    assert cfg["later"] == {"x": [1, 7], "y": 7}
    assert cfg["a"] == [1, 7]


def test_substitution_cycle_raises():
    with pytest.raises(HoconError, match="cycle"):
        load_config("a = ${b}\nb = ${a}")
    with pytest.raises(HoconError, match="cycle"):
        load_config('p = ${p}":x"')  # self-referential override: out of scope


def test_substitution_literal_in_quotes():
    # ${...} inside a quoted string is literal text, never a substitution
    assert load_config('a = "${not.a.sub}"') == {"a": "${not.a.sub}"}


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


# ------------------------------------------------------------- r5: includes
def test_include_merges_at_position(tmp_path):
    from elasticsearch_data_import_handler_ray.pipelines.hocon import load_config_file

    (tmp_path / "base.conf").write_text('a = 1\nb = { x = 10 }\n')
    (tmp_path / "main.conf").write_text(
        'include "base.conf"\nb.y = 20\na = 2\n'
    )
    cfg = load_config_file(str(tmp_path / "main.conf"))
    assert cfg == {"a": 2, "b": {"x": 10, "y": 20}}


def test_include_braced_root_and_nesting(tmp_path):
    from elasticsearch_data_import_handler_ray.pipelines.hocon import load_config_file

    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "inner.conf").write_text('{ deep = true }\n')
    (sub / "mid.conf").write_text('include "inner.conf"\nmid = 1\n')
    (tmp_path / "main.conf").write_text('include "sub/mid.conf"\ntop = ${mid}\n')
    cfg = load_config_file(str(tmp_path / "main.conf"))
    assert cfg == {"deep": True, "mid": 1, "top": 1}


def test_include_missing_and_required(tmp_path):
    from elasticsearch_data_import_handler_ray.pipelines.hocon import (
        HoconError,
        load_config_file,
    )

    (tmp_path / "a.conf").write_text('include "nope.conf"\nk = 1\n')
    assert load_config_file(str(tmp_path / "a.conf")) == {"k": 1}
    (tmp_path / "b.conf").write_text('include required("nope.conf")\nk = 1\n')
    import pytest as _pytest

    with _pytest.raises(HoconError, match="required include"):
        load_config_file(str(tmp_path / "b.conf"))


def test_include_cycle_raises(tmp_path):
    from elasticsearch_data_import_handler_ray.pipelines.hocon import (
        HoconError,
        load_config_file,
    )
    import pytest as _pytest

    (tmp_path / "x.conf").write_text('include "y.conf"\n')
    (tmp_path / "y.conf").write_text('include "x.conf"\n')
    with _pytest.raises(HoconError, match="cycle"):
        load_config_file(str(tmp_path / "x.conf"))


def test_include_in_string_value_untouched():
    from elasticsearch_data_import_handler_ray.pipelines.hocon import load_config

    cfg = load_config('q = "select include from t"\n')
    assert cfg == {"q": "select include from t"}


def test_relative_include_without_base_dir_raises():
    from elasticsearch_data_import_handler_ray.pipelines.hocon import (
        HoconError,
        load_config,
    )
    import pytest as _pytest

    with _pytest.raises(HoconError, match="file-based"):
        load_config('include "x.conf"\n')
