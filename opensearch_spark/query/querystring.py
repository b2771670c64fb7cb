"""Mini Lucene query-language parser (``query_string``).

Grammar subset of the reference's ``QueryStringQueryBuilder.java`` /
``index/search/QueryStringQueryParser.java`` (979+ LoC Java): boolean
operators AND/OR/NOT, ``+``/``-`` occurrence prefixes, quoted phrases
(with ``~N`` slop and ``^B`` boost suffixes), ``field:value``,
parentheses (with ``^B`` group boost), field-scoped groups
``field:(a OR b)``, trailing-``*`` prefix and ``*``/``?`` wildcards,
``term~``/``term~N`` fuzzy (AUTO when bare), ``term^B`` boosts,
bracket ranges ``field:[a TO b]`` / ``{a TO b}`` (mixed brackets,
``*`` open bounds) and inequality ranges ``field:>=v``.  Parses to the
same typed DSL tree the JSON queries use, so compilation/scoring is
shared with ``executor``.

Recursive descent:
    expr   := orExpr
    orExpr := andExpr (OR andExpr)*
    andExpr:= unary (AND unary)*
    unary  := NOT unary | '+' unary | '-' unary | primary
    primary:= '(' expr ')' ['^'B] | [field ':'] atom
    atom   := '"' ... '"' ['~'N] ['^'B] | '(' expr ')' ['^'B]
            | '[' v TO v ']' | '{' v TO v '}' | word
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from opensearch_spark.query import dsl as Q

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b) |
        (?P<or>OR\b) |
        (?P<not>NOT\b) |
        (?P<plus>\+) |
        (?P<minus>-) |
        (?P<range>(?:(?P<rfield>[A-Za-z_][\w.]*):)?
                  (?P<ropen>[\[\{])\s*(?P<rlo>[^\s\]\}]+)\s+TO\s+(?P<rhi>[^\s\]\}]+)\s*
                  (?P<rclose>[\]\}])(?:\^(?P<rboost>\d+(?:\.\d+)?))?) |
        (?P<phrase>"(?P<phrase_body>[^"]*)"
                   (?:~(?P<pslop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?) |
        (?P<word>[^\s()"]+)
    )""",
    re.VERBOSE,
)


class _Tokens:
    def __init__(self, s: str):
        self.toks: List[Tuple[str, object]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m or m.end() == pos:
                break
            pos = m.end()
            for name in ("lparen", "rparen", "and", "or", "not", "plus", "minus"):
                if m.group(name):
                    self.toks.append((name, m.group(name)))
                    break
            else:
                if m.group("range") is not None:
                    self.toks.append(
                        (
                            "range",
                            (
                                m.group("rfield"),
                                m.group("ropen"),
                                m.group("rlo"),
                                m.group("rhi"),
                                m.group("rclose"),
                                m.group("rboost"),
                            ),
                        )
                    )
                elif m.group("phrase") is not None:
                    self.toks.append(
                        (
                            "phrase",
                            (
                                m.group("phrase_body"),
                                m.group("pslop"),
                                m.group("pboost"),
                            ),
                        )
                    )
                elif m.group("word"):
                    self.toks.append(("word", m.group("word")))
        self.i = 0

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t


def parse_query_string(
    s: str, default_field: str = "text", default_operator: str = "or"
) -> Q.Query:
    tk = _Tokens(s)
    node = _parse_or(tk, default_field, default_operator, default_field)
    return node if node is not None else Q.MatchNone()


def _parse_or(tk: _Tokens, df: str, dop: str, tdf: str = None):
    tdf = df if tdf is None else tdf
    parts = [_parse_and(tk, df, dop, tdf)]
    while tk.peek() and tk.peek()[0] == "or":
        tk.next()
        parts.append(_parse_and(tk, df, dop, tdf))
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    return Q.Bool(should=parts, minimum_should_match=1)


def _parse_and(tk: _Tokens, df: str, dop: str, tdf: str = None):
    tdf = df if tdf is None else tdf
    parts = [_parse_unary(tk, df, dop, tdf)]
    while tk.peek() and tk.peek()[0] == "and":
        tk.next()
        parts.append(_parse_unary(tk, df, dop, tdf))
    # implicit adjacency: a sequence of unaries without AND/OR joins per
    # the default operator (Lucene's default_operator semantics)
    implicit = []
    while tk.peek() and tk.peek()[0] not in ("or", "and", "rparen"):
        implicit.append(_parse_unary(tk, df, dop, tdf))
    parts = [p for p in parts if p is not None]
    implicit = [p for p in implicit if p is not None]
    if implicit:
        all_parts = parts + implicit
        must = [p for p in all_parts if isinstance(p, _MustWrap)]
        must_not = [p for p in all_parts if isinstance(p, _NotWrap)]
        rest = [p for p in all_parts if not isinstance(p, (_MustWrap, _NotWrap))]
        if dop == "and":
            return Q.Bool(
                must=[_unwrap(p) for p in must] + rest,
                must_not=[_unwrap(p) for p in must_not],
            )
        return Q.Bool(
            must=[_unwrap(p) for p in must],
            should=rest,
            must_not=[_unwrap(p) for p in must_not],
            minimum_should_match=1 if rest and not must else 0,
        )
    if not parts:
        return None
    if len(parts) == 1:
        p = parts[0]
        if isinstance(p, _MustWrap):
            return _unwrap(p)
        if isinstance(p, _NotWrap):
            return Q.Bool(must_not=[_unwrap(p)])
        return p
    return Q.Bool(
        must=[_unwrap(p) if isinstance(p, _MustWrap) else p for p in parts if not isinstance(p, _NotWrap)],
        must_not=[_unwrap(p) for p in parts if isinstance(p, _NotWrap)],
    )


class _MustWrap:
    def __init__(self, node):
        self.node = node


class _NotWrap:
    def __init__(self, node):
        self.node = node


def _unwrap(p):
    return p.node if isinstance(p, (_MustWrap, _NotWrap)) else p


def _parse_unary(tk: _Tokens, df: str, dop: str, tdf: str = None):
    t = tk.peek()
    if t is None:
        return None
    tdf = df if tdf is None else tdf
    if t[0] == "not":
        tk.next()
        inner = _parse_unary(tk, df, dop, tdf)
        return _NotWrap(_unwrap(inner)) if inner is not None else None
    if t[0] == "plus":
        tk.next()
        inner = _parse_unary(tk, df, dop, tdf)
        return _MustWrap(_unwrap(inner)) if inner is not None else None
    if t[0] == "minus":
        tk.next()
        inner = _parse_unary(tk, df, dop, tdf)
        return _NotWrap(_unwrap(inner)) if inner is not None else None
    return _parse_primary(tk, df, dop, tdf)


# ----------------------------------------------------- simple_query_string

_SQS_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<pipe>\|) |
        (?P<plus>\+) |
        (?P<minus>-(?=\S)) |
        (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?) |
        (?P<word>[^\s()|+"]+)
    )""",
    re.VERBOSE,
)


def parse_simple_query_string(
    s: str,
    fields: Sequence[Tuple[str, float]] = (("text", 1.0),),
    default_operator: str = "or",
) -> Q.Query:
    """``simple_query_string`` (``SimpleQueryStringBuilder.java`` 617 LoC,
    parser ``SimpleQueryStringQueryParser.java``): the LENIENT end-user
    query language — it never raises on malformed input.

    Supported flag set (the reference's default ALL minus NEAR on bare
    terms): ``+`` AND, ``|`` OR, ``-`` negate the next clause, ``"..."``
    phrase with optional ``~N`` slop, ``(...)`` grouping, trailing ``*``
    prefix, ``term~N`` fuzzy, whitespace = ``default_operator``.
    Operators combine LEFT-ASSOCIATIVELY in input order (the reference's
    one-pass state machine — no AND-over-OR precedence, unlike
    ``query_string``).  Each atom expands to a per-field disjunction
    (scores of matching fields sum) with per-field boosts.

    Leniency: an unmatched ``)`` is skipped; an unmatched quote treats
    the rest as words; a dangling operator is ignored."""
    toks: List[Tuple[str, str, str]] = []
    pos = 0
    while pos < len(s):
        m = _SQS_TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            pos += 1  # lenient: skip unrecognized char
            continue
        pos = m.end()
        for name in ("lparen", "rparen", "pipe", "plus", "minus"):
            if m.group(name):
                toks.append((name, "", ""))
                break
        else:
            if m.group("phrase") is not None:
                toks.append(("phrase", m.group("phrase_body"), m.group("slop") or ""))
            elif m.group("word"):
                toks.append(("word", m.group("word"), ""))
    node, _ = _sqs_group(toks, 0, list(fields), default_operator)
    return node if node is not None else Q.MatchNone()


def _sqs_atom(kind: str, body: str, extra: str, fields, dop):
    def per_field(field: str, boost: float):
        if kind == "phrase":
            return Q.MatchPhrase(field, body, slop=int(extra) if extra else 0, boost=boost)
        word = body
        m = re.match(r"^(.*?)~(\d+)$", word)
        if m and m.group(1):
            return Q.Fuzzy(field, m.group(1), fuzziness=int(m.group(2)), boost=boost)
        if word.endswith("*") and len(word) > 1:
            return Q.Prefix(field, word[:-1].lower(), boost=boost)
        return Q.Match(field, word, boost=boost)

    clauses = [per_field(f, b) for f, b in fields]
    if len(clauses) == 1:
        return clauses[0]
    return Q.Bool(should=clauses, minimum_should_match=1)


def _sqs_combine(acc, node, op: str):
    if isinstance(node, _NotWrap):
        inner = _unwrap(node)
        if acc is None:
            return Q.Bool(must_not=[inner])
        return Q.Bool(must=[acc], must_not=[inner])
    if acc is None:
        return node
    if op == "and":
        return Q.Bool(must=[acc, node])
    return Q.Bool(should=[acc, node], minimum_should_match=1)


def _sqs_group(toks, i: int, fields, dop: str):
    acc = None
    pending: Optional[str] = None
    negate = False
    while i < len(toks):
        kind, body, extra = toks[i]
        i += 1
        if kind == "rparen":
            return acc, i
        if kind == "lparen":
            sub, i = _sqs_group(toks, i, fields, dop)
            if sub is not None:
                node = _NotWrap(sub) if negate else sub
                acc = _sqs_combine(acc, node, pending or dop)
            pending, negate = None, False
        elif kind == "pipe":
            pending = "or"
        elif kind == "plus":
            pending = "and"
        elif kind == "minus":
            negate = True
        else:
            node = _sqs_atom(kind, body, extra, fields, dop)
            if negate:
                node = _NotWrap(node)
            acc = _sqs_combine(acc, node, pending or dop)
            pending, negate = None, False
    return acc, i


def _range_value(v: str):
    """``*`` = open bound; numeric-looking bounds become numbers so
    comparisons on numeric doc columns are numeric, everything else
    stays a string (date strings compare lexicographically, as the
    reference's keyword ranges do)."""
    if v == "*":
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def _maybe_group_boost(tk: _Tokens, node):
    """Consume a ``^N`` word right after a closing paren: ``(a b)^2``
    (QueryStringQueryParser handles boost as a suffix on any clause)."""
    nxt = tk.peek()
    if node is not None and nxt and nxt[0] == "word":
        m = re.match(r"^\^(\d+(?:\.\d+)?)$", str(nxt[1]))
        if m and hasattr(node, "boost"):
            tk.next()
            node.boost = float(node.boost) * float(m.group(1))
    return node


def _parse_primary(tk: _Tokens, df: str, dop: str, tdf: str = None):
    tdf = df if tdf is None else tdf
    t = tk.peek()
    if t is None:
        return None
    if t[0] == "lparen":
        tk.next()
        node = _parse_or(tk, df, dop, tdf)
        if tk.peek() and tk.peek()[0] == "rparen":
            tk.next()
        return _maybe_group_boost(tk, node)
    if t[0] == "range":
        tk.next()
        rfield, ropen, rlo, rhi, rclose, rboost = t[1]
        lo, hi = _range_value(rlo), _range_value(rhi)
        kw = {}
        if lo is not None:
            kw["gte" if ropen == "[" else "gt"] = lo
        if hi is not None:
            kw["lte" if rclose == "]" else "lt"] = hi
        return Q.Range(rfield or df, boost=float(rboost) if rboost else 1.0, **kw)
    if t[0] == "phrase":
        tk.next()
        body, pslop, pboost = t[1]
        return Q.MatchPhrase(
            df,
            body,
            slop=int(pslop) if pslop else 0,
            boost=float(pboost) if pboost else 1.0,
        )
    if t[0] == "word":
        tk.next()
        word = t[1]
        field = df
        if ":" in word:
            field, word = word.split(":", 1)
            if word == "" and tk.peek() and tk.peek()[0] == "lparen":
                # field-scoped group: field:(a b OR c) — the sub-grammar
                # re-parses with the scoped default field
                tk.next()
                node = _parse_or(tk, field, dop, tdf)
                if tk.peek() and tk.peek()[0] == "rparen":
                    tk.next()
                return _maybe_group_boost(tk, node)
            if word.startswith('"') and word.endswith('"') and len(word) > 1:
                return Q.MatchPhrase(field, word[1:-1])
        boost = 1.0
        mb = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", word)
        if mb and mb.group(1):
            word, boost = mb.group(1), float(mb.group(2))
        # term~ / term~N fuzzy (AUTO when no edit count given)
        mf = re.match(r"^(.*?)~(\d*)$", word)
        if mf and mf.group(1) and "*" not in mf.group(1) and "?" not in mf.group(1):
            return Q.Fuzzy(
                field,
                mf.group(1),
                fuzziness=int(mf.group(2)) if mf.group(2) else None,
                boost=boost,
            )
        # inequality ranges: field:>=5, field:<2020-06-01, ...
        mr = re.match(r"^(>=|<=|>|<)(.+)$", word)
        if mr:
            op = {"<": "lt", "<=": "lte", ">": "gt", ">=": "gte"}[mr.group(1)]
            return Q.Range(field, boost=boost, **{op: _range_value(mr.group(2))})
        if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
            return Q.Prefix(field, word[:-1].lower(), boost=boost)
        if "*" in word or "?" in word:
            return Q.Wildcard(field, word.lower(), boost=boost)
        if field == tdf:
            # analyzed text field -> full-text match; any other
            # (keyword/numeric) field -> exact term, matching the
            # reference's per-field-type query building
            return Q.Match(field, word, boost=boost)
        return Q.Term(field, word, boost=boost)
    return None
