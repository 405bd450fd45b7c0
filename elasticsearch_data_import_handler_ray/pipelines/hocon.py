"""Minimal HOCON-subset loader — the reference's config files were HOCON
(Typesafe Config), not JSON. This covers the subset its configs actually
used, with no third-party dependency:

* ``key = value`` and ``key: value`` (`=`/`:` interchangeable)
* nested objects ``a { b = 1 }`` and dotted keys ``a.b = 1``
* an optional braced root ``{ a = 1 }`` (legal Typesafe Config; plain JSON
  documents therefore parse too)
* arrays ``[1, 2, 3]`` (newlines allowed as separators)
* unquoted strings, quoted strings, ints/floats/bools/null
* ``#`` and ``//`` comments; trailing commas; optional commas at newlines
* later duplicate keys OVERRIDE earlier ones (objects merge per HOCON)
* substitutions ``${a.b}`` and optional ``${?a.b}`` — resolved against the
  same document after the whole file is parsed (so forward references work),
  falling back to ``os.environ`` when the path is not in the document (the
  Typesafe environment-variable pattern). Value concatenation with
  substitutions (``url = ${host}":"${port}``, ``dir = ${base}/data``)
  renders every part to a string, preserving inter-token whitespace.
  A missing ``${?x}`` removes the key (empty string inside a concatenation);
  a missing ``${x}`` and substitution cycles raise ``HoconError``.

* ``include "file"`` / ``include file("f")`` / ``include required("f")``
  at statement position (one per line): the included document merges at
  that point with later-keys-override, relative to the including file;
  missing plain includes are no-ops, missing required() raises, cycles
  raise. Substitutions resolve across the merged document (Typesafe).

Deliberately out of scope (raise cleanly): ``+=``, multi-line strings,
URL includes, and self-referential overrides (``path = ${path}":x"`` — a
cycle here). Those were environment plumbing in the reference; a pipeline
spec needs none of them.

Usage: ``load_config(text)`` → plain dict, feed to PipelineSpec.from_dict.
The CLI ``pipeline`` verb auto-detects ``.conf`` files.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass


class HoconError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>[^\S\n]+)
  | (?P<comment>\#[^\n]*|//[^\n]*)
  | (?P<nl>\n)
  | (?P<subst>\$\{\??[^}\s]+\})
  | (?P<punct>[{}\[\],]|[=:])
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<unquoted>(?:[^\s{}\[\],=:\#"$]|\$(?!\{))+)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> tuple[list[tuple[str, str]], list[bool]]:
    """→ (tokens, gaps): gaps[i] is True when whitespace/comment separated
    token i from token i-1 (needed to render value concatenation)."""
    out: list[tuple[str, str]] = []
    gaps: list[bool] = []
    i, gap = 0, False
    while i < len(text):
        m = _TOKEN.match(text, i)
        if m is None:
            raise HoconError(f"bad character at offset {i}: {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            gap = True
            continue
        out.append((kind, m.group()))
        gaps.append(gap)
        gap = False
    out.append(("eof", ""))
    gaps.append(True)
    return out, gaps


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
    return tok


@dataclass
class _Subst:
    path: str
    optional: bool


@dataclass
class _Concat:
    parts: list  # str | _Subst, rendered left-to-right after resolution


_MISSING = object()


def _parse_subst(tok: str) -> _Subst:
    body = tok[2:-1]
    optional = body.startswith("?")
    return _Subst(body[1:] if optional else body, optional)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], gaps: list[bool]):
        self.toks = toks
        self.gaps = gaps
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
        if kind not in ("string", "unquoted", "subst"):
            raise HoconError(f"expected a value, got {tok!r}")
        # a value is a same-line concatenation of string/unquoted/subst parts
        parts: list = []
        saw_subst = False
        while True:
            kind, tok = self.peek()
            if kind == "string":
                self.next()
                parts.append(("str", json.loads(tok)))
            elif kind == "unquoted":
                self.next()
                parts.append(("unq", tok))
            elif kind == "subst":
                self.next()
                saw_subst = True
                parts.append(("sub", _parse_subst(tok)))
            else:
                break
            # inter-part whitespace is preserved in a string concatenation
            if self.peek()[0] in ("string", "unquoted", "subst") and self.gaps[self.i]:
                parts.append(("gap", " "))
        while parts and parts[-1][0] == "gap":
            parts.pop()
        if not saw_subst:
            text = "".join(p for _, p in parts if not isinstance(p, _Subst))
            if len(parts) == 1 and parts[0][0] == "str":
                return parts[0][1]  # a lone quoted string is never coerced
            return _scalar(text)
        if len(parts) == 1:
            return parts[0][1]  # a lone ${path} keeps the target's type
        return _Concat([p for _, p in parts])

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
        if top:
            self.skip_sep()
            if self.peek() == ("punct", "{"):
                # braced root — legal Typesafe Config (and every JSON object)
                out = self.parse_object()
                self.skip_sep()
                if self.peek()[0] != "eof":
                    raise HoconError(
                        f"trailing content after root object: {self.peek()[1]!r}"
                    )
                return out
        else:
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


def _render(v) -> str:
    """A resolved non-string part of a concatenation, rendered HOCON-style."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (dict, list)):
        raise HoconError("cannot concatenate an object/array into a string")
    return str(v)


def _resolve_tree(root: dict) -> dict:
    """Resolve every _Subst/_Concat in place against ``root`` (then
    ``os.environ``), with cycle detection on the substitution paths."""
    resolving: set[str] = set()

    def lookup(path: str):
        node = root
        for p in path.split("."):
            if not isinstance(node, dict) or p not in node:
                env = os.environ.get(path)
                if env is not None:
                    return env
                raise KeyError(path)
            node = node[p]
        return node

    def get(path: str):
        if path in resolving:
            raise HoconError(f"substitution cycle at ${{{path}}}")
        node = lookup(path)
        if isinstance(node, (_Subst, _Concat)):
            resolving.add(path)
            try:
                node = resolve_value(node)
            finally:
                resolving.discard(path)
        return node

    def resolve_value(v):
        if isinstance(v, _Subst):
            try:
                return get(v.path)
            except KeyError:
                if v.optional:
                    return _MISSING
                raise HoconError(f"unresolved substitution ${{{v.path}}}")
        if isinstance(v, _Concat):
            out = []
            for part in v.parts:
                if isinstance(part, _Subst):
                    r = resolve_value(part)
                    if r is _MISSING:
                        continue  # ${?x} inside a concatenation → empty
                    out.append(r if isinstance(r, str) else _render(r))
                else:
                    out.append(part)
            return "".join(out)
        return v

    def walk(node):
        if isinstance(node, dict):
            for k in list(node):
                v = node[k]
                if isinstance(v, (_Subst, _Concat)):
                    r = resolve_value(v)
                    if r is _MISSING:
                        del node[k]  # missing ${?x} removes the key
                    else:
                        node[k] = r
                        walk(r)
                else:
                    walk(v)
        elif isinstance(node, list):
            i = 0
            while i < len(node):
                v = node[i]
                if isinstance(v, (_Subst, _Concat)):
                    r = resolve_value(v)
                    if r is _MISSING:
                        del node[i]  # missing ${?x} drops the element
                        continue
                    node[i] = r
                    walk(r)
                else:
                    walk(v)
                i += 1

    walk(root)
    return root


_INCLUDE_RE = re.compile(
    r'^[^\S\n]*include[^\S\n]+(required\()?[^\S\n]*(?:file\()?[^\S\n]*'
    r'"([^"]+)"[^\S\n]*\)?[^\S\n]*\)?[^\S\n]*$',
    re.MULTILINE,
)


def _inline_includes(text: str, base_dir: str | None, seen: frozenset) -> str:
    """Typesafe-Config ``include`` (statement-position only, one per line):
    the included document's root object merges at the include position —
    which is EXACTLY what a textual splice gives under this parser's
    later-keys-override rule, and substitutions resolve across the merged
    document as Typesafe does. ``include "f"`` of a missing file is ignored
    (Typesafe semantics); ``include required("f")`` raises. Relative paths
    resolve against the including file's directory; cycles raise."""

    def repl(m: "re.Match[str]") -> str:
        required = bool(m.group(1))
        rel = m.group(2)
        if os.path.isabs(rel):
            path = rel
        elif base_dir is not None:
            path = os.path.join(base_dir, rel)
        else:
            raise HoconError(
                f"relative include {rel!r} needs a file-based load "
                "(load_config_file)"
            )
        real = os.path.realpath(path)
        if real in seen:
            raise HoconError(f"include cycle at {rel!r}")
        if not os.path.exists(real):
            if required:
                raise HoconError(f"required include missing: {rel!r}")
            return ""  # plain include of a missing file is a no-op
        with open(real) as f:
            sub = f.read()
        sub = _inline_includes(sub, os.path.dirname(real), seen | {real})
        s = sub.strip()
        if s.startswith("{") and s.endswith("}"):
            sub = s[1:-1]  # braced root: splice the KEYS, not a value
        return "\n" + sub + "\n"

    return _INCLUDE_RE.sub(repl, text)


def load_config(text: str, *, base_dir: str | None = None) -> dict:
    """Parse a HOCON-subset document (or plain JSON — it is a superset).
    ``base_dir`` anchors relative ``include`` statements (load_config_file
    passes the file's directory; absolute includes work either way)."""
    text = _inline_includes(text, base_dir, frozenset())
    if re.search(r"^[^\S\n]*include\b", text, re.MULTILINE):
        raise HoconError(
            "unsupported include form (use: include \"file\" / "
            "include file(\"f\") / include required(\"f\"))"
        )
    toks, gaps = _tokenize(text)
    return _resolve_tree(_Parser(toks, gaps).parse_object(top=True))


def load_config_file(path: str) -> dict:
    with open(path) as f:
        return load_config(f.read(), base_dir=os.path.dirname(os.path.abspath(path)))
