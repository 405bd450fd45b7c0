"""Minimal HOCON-subset loader — the reference's config files were HOCON
(Typesafe Config), not JSON. This covers the subset its configs actually
used, with no third-party dependency:

* ``key = value`` and ``key: value`` (`=`/`:` interchangeable)
* nested objects ``a { b = 1 }`` and dotted keys ``a.b = 1``
* arrays ``[1, 2, 3]`` (newlines allowed as separators)
* unquoted strings, quoted strings, ints/floats/bools/null
* ``#`` and ``//`` comments; trailing commas; optional commas at newlines
* later duplicate keys OVERRIDE earlier ones (objects merge per HOCON)

Deliberately out of scope (raise cleanly): includes, substitutions
(``${a.b}``), multi-line strings, ``+=``. Those were environment plumbing
in the reference; a pipeline spec needs none of them.

Usage: ``load_config(text)`` → plain dict, feed to PipelineSpec.from_dict.
The CLI ``pipeline`` verb auto-detects ``.conf`` files.
"""

from __future__ import annotations

import json
import re


class HoconError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>[^\S\n]+)
  | (?P<comment>\#[^\n]*|//[^\n]*)
  | (?P<nl>\n)
  | (?P<punct>[{}\[\],]|[=:])
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<unquoted>[^\s{}\[\],=:#"]+)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if m is None:
            raise HoconError(f"bad character at offset {i}: {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


_UNQUOTED = {"true": True, "false": False, "null": None}


def _scalar(tok: str):
    if tok in _UNQUOTED:
        return _UNQUOTED[tok]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    if "${" in tok:
        raise HoconError(f"substitutions are not supported: {tok!r}")
    return tok


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def skip_nl(self):
        while self.peek()[0] == "nl":
            self.next()

    def skip_sep(self):
        """Commas and newlines both separate entries."""
        while self.peek()[0] == "nl" or self.peek() == ("punct", ","):
            self.next()

    def parse_value(self):
        self.skip_nl()
        kind, tok = self.peek()
        if tok == "{":
            return self.parse_object()
        if tok == "[":
            return self.parse_array()
        if kind == "string":
            self.next()
            return json.loads(tok)
        if kind == "unquoted":
            # unquoted strings may span several tokens on one line
            # ("value with spaces") — concatenate until a separator
            parts = [self.next()[1]]
            while self.peek()[0] == "unquoted":
                parts.append(self.next()[1])
            return _scalar(" ".join(parts)) if len(parts) > 1 else _scalar(parts[0])
        raise HoconError(f"expected a value, got {tok!r}")

    def parse_array(self):
        assert self.next() == ("punct", "[")
        out = []
        while True:
            self.skip_sep()
            if self.peek() == ("punct", "]"):
                self.next()
                return out
            if self.peek()[0] == "eof":
                raise HoconError("unterminated array")
            out.append(self.parse_value())

    def parse_object(self, *, top: bool = False):
        if not top:
            assert self.next() == ("punct", "{")
        out: dict = {}
        while True:
            self.skip_sep()
            kind, tok = self.peek()
            if not top and (kind, tok) == ("punct", "}"):
                self.next()
                return out
            if kind == "eof":
                if top:
                    return out
                raise HoconError("unterminated object")
            # key
            if kind == "string":
                key = json.loads(self.next()[1])
            elif kind == "unquoted":
                key = self.next()[1]
            else:
                raise HoconError(f"expected a key, got {tok!r}")
            if key.endswith("+"):
                raise HoconError("'+=' is not supported")
            self.skip_nl()
            kind2, tok2 = self.peek()
            if tok2 in ("=", ":"):
                self.next()
                val = self.parse_value()
            elif tok2 == "{":
                val = self.parse_object()  # HOCON: key { ... } sugar
            else:
                raise HoconError(f"expected '=', ':' or '{{' after key {key!r}")
            _assign(out, key.split("."), val)


def _assign(d: dict, path: list[str], val) -> None:
    for p in path[:-1]:
        cur = d.get(p)
        if not isinstance(cur, dict):
            cur = {}
            d[p] = cur
        d = cur
    last = path[-1]
    if isinstance(val, dict) and isinstance(d.get(last), dict):
        _merge(d[last], val)  # HOCON object merge
    else:
        d[last] = val


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def load_config(text: str) -> dict:
    """Parse a HOCON-subset document (or plain JSON — it is a superset)."""
    if "include " in text or "include\t" in text:
        raise HoconError("'include' is not supported — inline the file")
    # substitutions tokenize as punctuation soup — refuse them up front,
    # except inside quoted strings (where ${...} is literal text)
    if re.search(r"\$\{", re.sub(r'"(?:[^"\\]|\\.)*"', "", text)):
        raise HoconError("substitutions (${...}) are not supported")
    return _Parser(_tokenize(text)).parse_object(top=True)


def load_config_file(path: str) -> dict:
    with open(path) as f:
        return load_config(f.read())
