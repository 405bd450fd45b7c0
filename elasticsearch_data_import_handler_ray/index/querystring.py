"""Lucene/ES ``query_string`` syntax → executable query tree (§2.B surface).

The reference imported documents INTO Elasticsearch and left querying to ES;
its users' day-one query surface is the Lucene query-string mini-language
(`q=...` / `query_string` query). This module rebuilds that surface for the
from-scratch engine:

  parse()    raw string → syntax tree (pure, no index access)
  compile_…  syntax tree → a picklable EVALUATION tree: terms analyzed with
             the index analyzer, wildcard/prefix/fuzzy leaves expanded
             against the term dictionary (capped), global idfs embedded
             (driver side, 1 df scatter round)
  the tree then ships to every QueryShard in ONE scatter and is evaluated
  per shard with sorted-array set algebra (see QueryShard._qs_eval) — no
  extra RPC rounds beyond plain search.

Supported grammar (the practical ES subset):

  a b             two clauses joined by the default operator (or|and)
  a AND b         both required            (also &&)
  a OR b          either                   (also ||)
  a AND b OR c    NO precedence — Lucene left-to-right occurrence rules:
                  '+a +b c' (use parens for '(a AND b) OR c')
  NOT a / -a / !a excluded (must_not)
  +a              required even when siblings are optional
  (a OR b) AND c  grouping
  "big data"      exact phrase (positional index required)
  "big data"~2    phrase with slop
  fuzz~1 / fuzz~  fuzzy term (Levenshtein ≤ N, default 2)
  pre*            prefix expansion
  w*ld / w?ld     wildcard expansion
  term^2.5        clause boost (any clause/group may carry ^boost)
  field:term      accepted only when ``field`` names the indexed column
  \\*  \\"  \\:     backslash escapes any special character

Semantics (ES bool): a doc matches a node iff every ``must`` child matches,
no ``must_not`` child matches, and — when the node has no must children —
at least ``minimum_should_match`` (default 1) should children match. Score =
Σ of the matching scoring children (must then should, in written order; each
leaf is BM25, multiplied by its boost), the Lucene sum-of-matching-clauses
rule. Multi-term expansions (wildcard/prefix/fuzzy) rewrite to a scoring
boolean (per-expanded-term BM25 with its own idf — Lucene's
``rewrite=scoring_boolean``), accumulated in ascending-term order per the
repo-wide bit-exactness rule. A purely negative query (only must_not
clauses) is rejected, as standalone Lucene does.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --------------------------------------------------------------------- lexer
_SPECIAL = set('+-!(){}[]^"~*?:\\/&|')


@dataclass
class _Tok:
    kind: str  # word | quoted | op | lparen | rparen | plus | minus | boost | fuzz
    text: str = ""
    num: float = 0.0
    wild: bool = False  # word contained an unescaped * or ?


def _lex(q: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("lparen")); i += 1
        elif c == ")":
            toks.append(_Tok("rparen")); i += 1
        elif c == "+":
            toks.append(_Tok("plus")); i += 1
        elif c in "-!":
            toks.append(_Tok("minus")); i += 1
        elif c == "&" and q[i : i + 2] == "&&":
            toks.append(_Tok("op", "AND")); i += 2
        elif c == "|" and q[i : i + 2] == "||":
            toks.append(_Tok("op", "OR")); i += 2
        elif c == "^":
            j = i + 1
            while j < n and (q[j].isdigit() or q[j] in ".eE+-"):
                j += 1
            try:
                boost = float(q[i + 1 : j])
            except ValueError:
                raise ValueError(f"bad boost at position {i}: {q[i:j]!r}")
            if boost < 0:
                # ES rejects negative boosts; silently accepting one would
                # flip clause score signs and invert top-k order (ADVICE r4)
                raise ValueError(f"negative boost at position {i}: {q[i:j]!r}")
            toks.append(_Tok("boost", num=boost))
            i = j
        elif c == "~":
            j = i + 1
            while j < n and (q[j].isdigit() or q[j] == "."):
                j += 1
            toks.append(_Tok("fuzz", num=float(q[i + 1 : j]) if j > i + 1 else -1.0))
            i = j
        elif c == '"':
            j, buf = i + 1, []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1]); j += 2
                else:
                    buf.append(q[j]); j += 1
            if j >= n:
                raise ValueError("unterminated quoted phrase")
            toks.append(_Tok("quoted", "".join(buf)))
            i = j + 1
        else:
            buf, wild = [], False
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()+^~"!':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1]); j += 2
                    continue
                if q[j] == "/" and (not buf or buf[-1] == ":"):
                    # /regexp/ (bare or field:/regexp/): the pattern may
                    # contain any otherwise-special character; consume through
                    # the closing unescaped slash
                    k = j + 1
                    while k < n and q[k] != "/":
                        k += 2 if q[k] == "\\" else 1
                    if k >= n:
                        raise ValueError("unterminated regexp (missing closing /)")
                    buf.append(q[j : k + 1])
                    j = k + 1
                    continue
                if q[j] in "[{" and buf and buf[-1] == ":":
                    # field:[lo TO hi] / field:{lo TO hi} — spaces are part of
                    # the range body, consume through the closing bracket
                    k = j
                    while k < n and q[k] not in "]}":
                        k += 1
                    if k >= n:
                        raise ValueError("unterminated range (missing ] or })")
                    buf.append(q[j : k + 1])
                    j = k + 1
                    continue
                if q[j] in "&|" and q[j : j + 2] in ("&&", "||"):
                    break
                if q[j] == "-" and buf:  # in-word hyphen is literal
                    buf.append(q[j]); j += 1
                    continue
                if q[j] in "*?":
                    wild = True
                buf.append(q[j]); j += 1
            w = "".join(buf)
            if w in ("AND", "OR", "NOT"):
                toks.append(_Tok("op", w))
            elif w:
                toks.append(_Tok("word", w, wild=wild))
            i = j
    return toks


# ----------------------------------------------------------------- parse AST
@dataclass
class Leaf:
    kind: str  # term | phrase | wildcard | prefix | fuzzy | range
    text: str
    boost: float = 1.0
    slop: int = 0
    edits: int = 2
    # range-only (ES/Lucene `field:[lo TO hi]`, `field:>=x`): bounds are
    # float when numeric else raw string; None = unbounded (`*`)
    field_name: str | None = None
    lo: object = None
    hi: object = None
    lo_incl: bool = True
    hi_incl: bool = True


@dataclass
class Group:
    """Parenthesized / operator-built bool of (occur, child) pairs."""

    clauses: list = field(default_factory=list)  # [(occur, node)], occur ∈ must|should|must_not
    boost: float = 1.0


class _Parser:
    def __init__(self, toks: list[_Tok], default_operator: str):
        if default_operator not in ("or", "and"):
            raise ValueError("default_operator must be 'or' or 'and'")
        self.toks = toks
        self.i = 0
        self.default_occur = "must" if default_operator == "and" else "should"

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    # Lucene's classic QueryParser has NO operator precedence: clauses are
    # collected left-to-right into ONE flat boolean, and AND/OR merely adjust
    # the occurrence flags of the two adjacent clauses (QueryParserBase
    # addClause semantics).  'a AND b OR c' is therefore '+a +b c' — NOT
    # '(a AND b) OR c' — so docs containing only 'c' do not match.  Fixed in
    # round 4 per ADVICE (the old parser gave AND higher precedence).
    def parse_expr(self) -> Group:
        g = Group()
        conj: str | None = None  # operator seen since the previous clause
        while (t := self.peek()) is not None and t.kind != "rparen":
            if t.kind == "op" and t.text in ("AND", "OR"):
                self.next()
                conj = t.text
                continue
            mods, node = self.parse_clause()
            if g.clauses and g.clauses[-1][0] != "must_not":
                # AND promotes the preceding clause to must (both modes);
                # OR demotes it to should only in default-AND mode (Lucene:
                # 'a OR b' under AND must not parse as '+a b')
                if conj == "AND":
                    g.clauses[-1] = ("must", g.clauses[-1][1])
                elif conj == "OR" and self.default_occur == "must":
                    g.clauses[-1] = ("should", g.clauses[-1][1])
            if mods == "default":
                if self.default_occur == "should":  # default_operator=or
                    occur = "must" if conj == "AND" else "should"
                else:  # default_operator=and
                    occur = "should" if conj == "OR" else "must"
            elif mods == "must" and self.default_occur == "must" and conj == "OR":
                # Lucene AND-mode quirk: '+' after OR is ignored
                occur = "should"
            else:
                occur = mods
            g.clauses.append((occur, node))
            conj = None
        if not g.clauses:
            raise ValueError("empty query")
        return g

    # clause := [+|-|NOT] primary [^boost]
    def parse_clause(self) -> tuple[str, object]:
        occur = "default"
        t = self.peek()
        if t is not None and t.kind == "plus":
            self.next(); occur = "must"
        elif t is not None and t.kind == "minus":
            self.next(); occur = "must_not"
        elif t is not None and t.kind == "op" and t.text == "NOT":
            self.next(); occur = "must_not"
        node = self.parse_primary()
        t = self.peek()
        if t is not None and t.kind == "boost":
            self.next()
            node.boost *= t.num
        return occur, node

    def parse_primary(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t.kind == "lparen":
            self.next()
            g = self.parse_expr()
            t2 = self.peek()
            if t2 is None or t2.kind != "rparen":
                raise ValueError("missing closing parenthesis")
            self.next()
            return g
        if t.kind == "quoted":
            self.next()
            leaf = Leaf("phrase", t.text)
            nxt = self.peek()
            if nxt is not None and nxt.kind == "fuzz":
                self.next()
                leaf.slop = int(nxt.num) if nxt.num >= 0 else 0
            return leaf
        if t.kind == "word":
            self.next()
            word = t.text
            rx = _try_parse_regexp(word)
            if rx is not None:
                return rx
            rng = _try_parse_range(word)
            if rng is not None:
                return rng
            nxt = self.peek()
            if nxt is not None and nxt.kind == "fuzz":
                self.next()
                edits = 2 if nxt.num < 0 else int(nxt.num)
                return Leaf("fuzzy", word, edits=edits)
            if t.wild:
                if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                    return Leaf("prefix", word[:-1])
                return Leaf("wildcard", word)
            return Leaf("term", word)
        raise ValueError(f"unexpected token {t.kind} {t.text!r} in query")


def _range_bound(raw: str):
    """`*` → None (unbounded); numeric → float; else the raw string."""
    raw = raw.strip()
    if raw in ("*", ""):
        return None
    try:
        return float(raw)
    except ValueError:
        return raw


def _try_parse_regexp(word: str) -> Leaf | None:
    """``/pattern/`` or ``field:/pattern/`` → Leaf(kind="regexp") whose
    ``text`` is the BARE pattern (no slashes) and ``field_name`` the optional
    field. Checked before field-splitting so a bare pattern containing ':'
    is not mistaken for a field prefix."""
    if len(word) >= 2 and word[0] == "/" and word[-1] == "/":
        return Leaf("regexp", word[1:-1], field_name=None)
    f, body = split_field(word)
    if f is not None and len(body) >= 2 and body[0] == "/" and body[-1] == "/":
        return Leaf("regexp", body[1:-1], field_name=f)
    return None


def _try_parse_range(word: str) -> Leaf | None:
    """``field:[lo TO hi]`` / ``field:{lo TO hi}`` (mixed brackets ok,
    ``*`` = unbounded) and ``field:>x`` / ``>=`` / ``<`` / ``<=`` →
    Leaf(kind="range"); anything else → None."""
    f, body = split_field(word)
    if f is None or not body:
        return None
    if f == "_exists_":
        # ES `_exists_:field`: docs whose doc-value for `field` is non-null;
        # modeled as the fully-unbounded range (eval drops nulls)
        return Leaf("range", word, field_name=body)
    if body[0] in "[{" and body[-1] in "]}":
        inner = body[1:-1]
        parts = inner.split(" TO ")
        if len(parts) != 2:
            raise ValueError(f"bad range {word!r}: expected '[lo TO hi]'")
        return Leaf(
            "range", word, field_name=f,
            lo=_range_bound(parts[0]), hi=_range_bound(parts[1]),
            lo_incl=body[0] == "[", hi_incl=body[-1] == "]",
        )
    if body[0] in "<>":
        op = body[:2] if body[1:2] == "=" else body[:1]
        val = _range_bound(body[len(op):])
        if val is None:
            raise ValueError(f"bad range {word!r}: missing bound after {op}")
        if op in (">", ">="):
            return Leaf("range", word, field_name=f, lo=val, lo_incl=op == ">=")
        return Leaf("range", word, field_name=f, hi=val, hi_incl=op == "<=")
    return None


def parse(q: str, default_operator: str = "or") -> Group:
    """Query string → syntax tree. Raises ValueError on malformed input."""
    toks = _lex(q)
    if not toks:
        raise ValueError("empty query")
    p = _Parser(toks, default_operator)
    g = p.parse_expr()
    if p.peek() is not None:
        t = p.peek()
        raise ValueError(f"trailing token {t.kind} {t.text!r}")
    if isinstance(g, Leaf):  # single bare clause
        g = Group(clauses=[("should", g)])
    return g


# ------------------------------------------------------------------- compile
def split_field(word: str) -> tuple[str | None, str]:
    """``field:term`` → (field, term); no colon → (None, word)."""
    if ":" in word:
        f, _, rest = word.partition(":")
        if f and rest:
            return f, rest
    return None, word


def collect_leaves(node) -> list[Leaf]:
    if isinstance(node, Leaf):
        return [node]
    out: list[Leaf] = []
    for _, c in node.clauses:
        out.extend(collect_leaves(c))
    return out


def compile_tree(
    node,
    analyzer,
    dfs: dict[str, int],
    idf_of,
    expansions: dict[tuple[str, str], list[str]],
    default_operator: str = "or",
) -> dict:
    """Syntax tree → picklable evaluation tree for QueryShard._qs_eval.

    ``dfs`` maps every analyzed/expanded term to its GLOBAL df (0 = unknown);
    ``idf_of(term)`` → float idf; ``expansions[(kind, text)]`` → expanded
    dictionary terms for wildcard/prefix/fuzzy leaves (driver pre-computed).
    Compiled node kinds: term | group | phrase | bool | none.
    """
    if isinstance(node, Leaf):
        if node.kind == "range":
            # constant-score filter leaf (Lucene: each matching doc scores
            # 1.0 × boost); evaluated against the actor's doc-values
            return {
                "kind": "range", "field": node.field_name,
                "lo": node.lo, "hi": node.hi,
                "lo_incl": node.lo_incl, "hi_incl": node.hi_incl,
                "boost": node.boost,
            }
        if node.kind == "term":
            toks = list(dict.fromkeys(analyzer.analyze_query(split_field(node.text)[1])))
            if not toks:
                return {"kind": "none"}
            live = [t for t in toks if dfs.get(t, 0) > 0]
            if not live or (default_operator == "and" and len(live) < len(toks)):
                return {"kind": "none"}  # (and-mode: a required token is unknown)
            if len(live) == 1:
                return {
                    "kind": "term", "term": live[0],
                    "idf": idf_of(live[0]), "boost": node.boost,
                }
            terms = sorted(live)
            return {
                "kind": "group", "terms": terms,
                "idfs": {t: idf_of(t) for t in terms},
                "msm": len(terms) if default_operator == "and" else 1,
                "boost": node.boost,
            }
        if node.kind == "phrase":
            toks = analyzer.analyze_query(node.text)
            if not toks:
                return {"kind": "none"}
            if any(dfs.get(t, 0) == 0 for t in toks):
                return {"kind": "none"}  # a never-seen token matches no phrase
            return {
                "kind": "phrase", "phrase": toks,
                "idfs": {t: idf_of(t) for t in sorted(set(toks))},
                "slop": node.slop, "boost": node.boost,
            }
        # wildcard / prefix / fuzzy: pre-expanded on the driver
        exp = sorted(t for t in expansions.get((node.kind, node.text), []) if dfs.get(t, 0) > 0)
        if not exp:
            return {"kind": "none"}
        return {
            "kind": "group", "terms": exp,
            "idfs": {t: idf_of(t) for t in exp},
            "msm": 1, "boost": node.boost,
        }
    # Group → bool
    out = {"kind": "bool", "must": [], "should": [], "must_not": [],
           "msm": 1, "boost": node.boost}
    had_positive = False
    for occur, child in node.clauses:
        c = compile_tree(child, analyzer, dfs, idf_of, expansions, default_operator)
        if occur != "must_not":
            had_positive = True
        if c["kind"] == "none":
            if occur == "must":
                return {"kind": "none"}  # a required clause that cannot match
            # a should/must_not clause matching nothing is droppable (and
            # droppable for msm: it contributes 0 hits at any msm ≥ 1)
            continue
        out[occur].append(c)
    if not had_positive:
        raise ValueError("purely negative query (only must_not clauses) is not supported")
    if not out["must"] and not out["should"]:
        return {"kind": "none"}
    return out
