"""Painless expression subset -> Catalyst ``Column`` compiler.

Reference: ``modules/lang-painless`` (``PainlessScriptEngine.java``; the
expression AST under ``.../painless/node/`` — ``EBinary``, ``EComp``,
``EConditional``, ``EBrace``/``EDot`` for ``doc['f'].value`` chains).
The reference compiles Painless to JVM bytecode per script context; here
the same *expression* subset compiles to a Catalyst ``Column`` so user
scripts written in the reference's own syntax run inside whole-stage
codegen — zero Python in the scoring / filter / sort path.

Supported surface (the subset the reference's own REST tests exercise
for script_score / script query / script sort / script_fields):

- literals: ints, floats (optional ``f``/``d``/``l`` suffix), single- or
  double-quoted strings, ``true`` / ``false`` / ``null``
- operators: ``+ - * / %``, ``== != < <= > >=``, ``&& || !``, unary
  ``-``/``+``, ternary ``cond ? a : b``, parentheses; an optional
  leading ``return`` and trailing ``;`` (single-expression scripts)
- ``doc['field'].value`` / ``doc.field.value``, ``doc[...].empty``,
  ``doc[...].size()``, ``doc[...].value.length()`` etc.
- ``params.name`` / ``params['name']`` — bound at compile time
- ``_score`` (score-context scripts)
- ``ctx.field`` / ``ctx['field']`` — ingest-processor context, where
  the field access IS the value (``IngestDocument`` map semantics)
- ``Math.log/log10/exp/sqrt/abs/pow/max/min/floor/ceil/round``,
  ``Math.PI`` / ``Math.E``
- ``String`` instance methods on values: ``contains / startsWith /
  endsWith / toLowerCase / toUpperCase / length / equals``

Documented deviations (same class as the repo-wide "Catalyst as the
Painless analog" note, SURVEY §2.9):

- arithmetic follows Catalyst numeric semantics — ``/`` on two integer
  operands promotes to double (Painless keeps Java int division).
  ``Math.round`` IS Java-exact (``floor(x + 0.5)``, not half-up).
- a missing field under ``doc[...].value`` yields SQL ``NULL`` and
  three-valued logic, where Painless would throw; ``x == null`` /
  ``x != null`` compile to ``isNull`` / ``isNotNull`` so the idiomatic
  null guard works.
- no loops, local variables, or multi-statement blocks — scripts are
  single expressions (the reference's lang-expression module has the
  same restriction; richer scripts take the ``fn=`` pandas path).
"""

from __future__ import annotations

import math
import re
from typing import Callable, Dict, List, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "compile_painless",
    "script_expr",
    "extract_doc_fields",
    "looks_painless",
    "PainlessError",
]


class PainlessError(ValueError):
    """Parse / compile error with position context."""


# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?[fFdDlL]?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|&&|\|\||[-+*/%!?:()\[\].,;<>])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> List[tuple]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise PainlessError(f"painless: unexpected character {src[pos]!r} at {pos}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        toks.append((m.lastgroup, m.group(), m.start()))
    toks.append(("eof", "", len(src)))
    return toks


# ------------------------------------------------------------- sentinels

class _Doc:        # `doc` before subscripting
    pass


class _Ctx:        # ingest `ctx` — access IS the value
    pass


class _Params:     # `params` before subscripting
    pass


class _Math:       # `Math` before method/constant access
    pass


class _Null:       # the `null` literal (isNull/isNotNull in equality)
    pass


class _Field:
    """``doc['f']`` awaiting ``.value`` / ``.empty`` / ``.size()``."""

    def __init__(self, name: str):
        self.name = name


_MATH_1 = {
    "log": F.log,            # natural log (Java Math.log)
    "log10": F.log10,
    "exp": F.exp,
    "sqrt": F.sqrt,
    "abs": F.abs,
}
_MATH_CONST = {"PI": math.pi, "E": math.e}

_STR_METHODS = {
    "contains", "startsWith", "endsWith", "toLowerCase", "toUpperCase",
    "length", "equals",
}


# ---------------------------------------------------------------- parser

class _Parser:
    def __init__(
        self,
        src: str,
        resolver: Callable[[str], Column],
        params: Optional[Dict] = None,
        score: Optional[Column] = None,
    ):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0
        self.resolver = resolver
        self.params = params or {}
        self.score = score

    # -- token helpers
    def _peek(self):
        return self.toks[self.i]

    def _next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, val: str):
        kind, tok, pos = self._next()
        if tok != val:
            raise PainlessError(
                f"painless: expected {val!r} at {pos}, found {tok!r} in {self.src!r}"
            )

    def _err(self, msg: str):
        _, tok, pos = self._peek()
        raise PainlessError(f"painless: {msg} at {pos} (near {tok!r}) in {self.src!r}")

    # -- entry
    def parse(self) -> Column:
        if self._peek()[1] == "return":
            self._next()
        col = self._ternary()
        if self._peek()[1] == ";":
            self._next()
        if self._peek()[0] != "eof":
            self._err("trailing input")
        return self._as_column(col)

    # -- precedence climb
    def _ternary(self):
        cond = self._or()
        if self._peek()[1] == "?":
            self._next()
            a = self._ternary()
            self._expect(":")
            b = self._ternary()
            return F.when(self._as_column(cond), self._as_column(a)).otherwise(
                self._as_column(b)
            )
        return cond

    def _or(self):
        left = self._and()
        while self._peek()[1] == "||":
            self._next()
            left = self._as_column(left) | self._as_column(self._and())
        return left

    def _and(self):
        left = self._eq()
        while self._peek()[1] == "&&":
            self._next()
            left = self._as_column(left) & self._as_column(self._eq())
        return left

    def _eq(self):
        left = self._rel()
        while self._peek()[1] in ("==", "!="):
            op = self._next()[1]
            right = self._rel()
            # idiomatic null guard: `x == null` -> isNull (Catalyst's
            # NULL-propagating equality would yield NULL, never true)
            if isinstance(right, _Null) or isinstance(left, _Null):
                col = right if isinstance(left, _Null) else left
                col = self._as_column(col)
                left = col.isNull() if op == "==" else col.isNotNull()
            else:
                l, r = self._as_column(left), self._as_column(right)
                left = (l == r) if op == "==" else (l != r)
        return left

    def _rel(self):
        left = self._add()
        while self._peek()[1] in ("<", "<=", ">", ">="):
            op = self._next()[1]
            l, r = self._as_column(left), self._as_column(self._add())
            left = {"<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r}[op]
        return left

    def _add(self):
        left = self._mul()
        while self._peek()[1] in ("+", "-"):
            op = self._next()[1]
            l, r = self._as_column(left), self._as_column(self._mul())
            left = (l + r) if op == "+" else (l - r)
        return left

    def _mul(self):
        left = self._unary()
        while self._peek()[1] in ("*", "/", "%"):
            op = self._next()[1]
            l, r = self._as_column(left), self._as_column(self._unary())
            left = {"*": l * r, "/": l / r, "%": l % r}[op]
        return left

    def _unary(self):
        tok = self._peek()[1]
        if tok == "-":
            self._next()
            return -self._as_column(self._unary())
        if tok == "+":
            self._next()
            return self._as_column(self._unary())
        if tok == "!":
            self._next()
            return ~self._as_column(self._unary())
        return self._postfix()

    # -- postfix chains: doc['f'].value, Math.log(x), s.contains('a')
    def _postfix(self):
        val = self._primary()
        while True:
            tok = self._peek()[1]
            if tok == ".":
                self._next()
                kind, name, _ = self._next()
                if kind != "id":
                    self._err("expected member name after '.'")
                val = self._member(val, name)
            elif tok == "[":
                self._next()
                if isinstance(val, (_Doc, _Ctx, _Params)):
                    kind, key, _ = self._next()
                    if kind != "str":
                        self._err("expected string key in [...] access")
                    self._expect("]")
                    val = self._subscript(val, _unquote(key))
                else:
                    self._err("[...] access only on doc/ctx/params")
            else:
                return val

    def _member(self, val, name: str):
        nxt = self._peek()[1]
        if isinstance(val, _Doc) or isinstance(val, _Ctx):
            return self._subscript(val, name)
        if isinstance(val, _Params):
            return self._subscript(val, name)
        if isinstance(val, _Math):
            if name in _MATH_CONST and nxt != "(":
                return F.lit(_MATH_CONST[name])
            args = self._call_args()
            return self._math_call(name, args)
        if isinstance(val, _Field):
            if name == "value":
                return self.resolver(val.name)
            if name == "empty":
                return self.resolver(val.name).isNull()
            if name == "size":
                self._call_args()  # ()
                c = self.resolver(val.name)
                return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(1))
            if name == "length":
                self._call_args()
                return F.length(self.resolver(val.name))
            self._err(f"unsupported doc-values member .{name}")
        # String instance methods on an already-resolved Column
        if isinstance(val, Column) and name in _STR_METHODS:
            args = self._call_args()
            return self._str_call(val, name, args)
        self._err(f"unsupported member access .{name}")

    def _subscript(self, val, key: str):
        if isinstance(val, _Doc):
            return _Field(key)
        if isinstance(val, _Ctx):
            return self.resolver(key)     # ctx access IS the value
        if isinstance(val, _Params):
            if key not in self.params:
                raise PainlessError(f"painless: missing params[{key!r}]")
            return F.lit(self.params[key])
        self._err("invalid subscript")

    def _call_args(self) -> List[Column]:
        self._expect("(")
        args: List[Column] = []
        if self._peek()[1] != ")":
            args.append(self._as_column(self._ternary()))
            while self._peek()[1] == ",":
                self._next()
                args.append(self._as_column(self._ternary()))
        self._expect(")")
        return args

    def _math_call(self, name: str, args: List[Column]) -> Column:
        if name in _MATH_1:
            if len(args) != 1:
                raise PainlessError(f"painless: Math.{name} takes 1 arg")
            return _MATH_1[name](args[0])
        if name in ("floor", "ceil"):
            if len(args) != 1:
                raise PainlessError(f"painless: Math.{name} takes 1 arg")
            # Java Math.floor/ceil(double) -> double (F.floor returns long)
            return (F.floor if name == "floor" else F.ceil)(args[0]).cast("double")
        if name == "round":
            if len(args) != 1:
                raise PainlessError("painless: Math.round takes 1 arg")
            # Java-exact: floor(x + 0.5) -> long (NOT SQL half-up, which
            # differs on negative halves: Java rounds -2.5 to -2)
            return F.floor(args[0] + F.lit(0.5)).cast("long")
        if name == "pow":
            if len(args) != 2:
                raise PainlessError("painless: Math.pow takes 2 args")
            return F.pow(args[0], args[1])
        if name in ("max", "min"):
            if len(args) != 2:
                raise PainlessError(f"painless: Math.{name} takes 2 args")
            return (F.greatest if name == "max" else F.least)(*args)
        raise PainlessError(f"painless: unsupported Math.{name}")

    def _str_call(self, col: Column, name: str, args: List[Column]) -> Column:
        n1 = {"contains", "startsWith", "endsWith", "equals"}
        if name in n1 and len(args) != 1:
            raise PainlessError(f"painless: .{name} takes 1 arg")
        if name == "contains":
            return col.contains(args[0])
        if name == "startsWith":
            return col.startswith(args[0])
        if name == "endsWith":
            return col.endswith(args[0])
        if name == "equals":
            return col == args[0]
        if args:
            raise PainlessError(f"painless: .{name} takes no args")
        if name == "toLowerCase":
            return F.lower(col)
        if name == "toUpperCase":
            return F.upper(col)
        if name == "length":
            return F.length(col)
        raise PainlessError(f"painless: unsupported string method .{name}")

    def _primary(self):
        kind, tok, pos = self._next()
        if kind == "num":
            body = tok.rstrip("fFdDlL")
            if "." in body or "e" in body or "E" in body or tok[-1:] in "fFdD":
                return F.lit(float(body))
            return F.lit(int(body))
        if kind == "str":
            return F.lit(_unquote(tok))
        if kind == "id":
            if tok == "true":
                return F.lit(True)
            if tok == "false":
                return F.lit(False)
            if tok == "null":
                return _Null()
            if tok == "doc":
                return _Doc()
            if tok == "ctx":
                return _Ctx()
            if tok == "params":
                return _Params()
            if tok == "Math":
                return _Math()
            if tok == "_score":
                if self.score is None:
                    raise PainlessError(
                        "painless: _score not available in this context"
                    )
                return self.score
            raise PainlessError(
                f"painless: unknown identifier {tok!r} at {pos} — field access "
                f"is doc[{tok!r}].value (or ctx.{tok} in ingest scripts)"
            )
        if tok == "(":
            inner = self._ternary()
            self._expect(")")
            return inner
        raise PainlessError(f"painless: unexpected token {tok!r} at {pos}")

    def _as_column(self, v) -> Column:
        if isinstance(v, Column):
            return v
        if isinstance(v, _Null):
            return F.lit(None)
        if isinstance(v, _Field):
            raise PainlessError(
                f"painless: doc[{v.name!r}] needs .value/.empty/.size()"
            )
        raise PainlessError(f"painless: incomplete expression ({type(v).__name__})")


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


# ------------------------------------------------------------ public API

def compile_painless(
    source: str,
    *,
    resolver: Callable[[str], Column] = F.col,
    params: Optional[Dict] = None,
    score: Optional[Column] = None,
) -> Column:
    """Compile a Painless expression to a Catalyst ``Column``.

    ``resolver`` maps a doc-values field name (``doc['f']`` / ``ctx.f``)
    to its ``Column``; ``params`` binds ``params.x`` at compile time;
    ``score`` is the ``_score`` Column (None outside score contexts).
    """
    return _Parser(source, resolver, params, score).parse()


_DOC_BRACKET = re.compile(r"doc\[\s*['\"]([^'\"]+)['\"]\s*\]")
_DOC_DOTTED = re.compile(r"\bdoc\.([A-Za-z_][A-Za-z0-9_]*)")
_LOOKS = re.compile(r"doc\[|\bdoc\.[A-Za-z_]|\bctx\.|\bctx\[|\bMath\.|\bparams\.|\bparams\[")


def extract_doc_fields(source: str) -> List[str]:
    """Field names a Painless source reads via ``doc[...]`` — used by
    call sites to join/fetch exactly those doc-values columns (the
    reference resolves the same set through ``SearchLookup``)."""
    out = list(_DOC_BRACKET.findall(source))
    out += [m for m in _DOC_DOTTED.findall(source) if m not in out]
    return out


def looks_painless(source: str) -> bool:
    """Heuristic language sniff: ``doc['f']`` / ``ctx.f`` / ``Math.`` /
    ``params.`` syntax is Painless and never valid Spark SQL, so scripts
    written in the reference's own syntax route to this compiler even
    without an explicit ``"lang": "painless"``."""
    return bool(_LOOKS.search(source))


def script_expr(
    source: str,
    lang: Optional[str] = None,
    *,
    resolver: Callable[[str], Column] = F.col,
    params: Optional[Dict] = None,
    score: Optional[Column] = None,
) -> Column:
    """Uniform script entry for every executor site: explicit
    ``lang="painless"`` (or a syntactic sniff) compiles through
    :func:`compile_painless`; anything else stays the documented
    Spark-SQL path (``F.expr``) — existing scripts are untouched."""
    # lang-expression (modules/lang-expression, ExpressionScriptEngine.
    # java): numeric-only Lucene expressions over doc-values —
    # `doc['f'].value` arithmetic — a strict subset of the Painless
    # expression surface this compiler accepts, so `"lang":
    # "expression"` scripts compile through the same path.
    if lang in ("painless", "expression") or (
        lang is None and looks_painless(source)
    ):
        return compile_painless(
            source, resolver=resolver, params=params, score=score
        )
    return F.expr(source)
