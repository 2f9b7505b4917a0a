"""A compiled subset of the reference's CEL expression scripts.

Reference: planetiler-custommap evaluates `${ ... }` strings with CEL
(expression/ConfigExpressionScript.java:23-27 EXPRESSION_PATTERN,
Contexts.java:350-368 for the `feature.*` environment, stdlib/PlanetilerStdLib
for coalesce/nullif/regexp/min/max helpers).

This module re-expresses the commonly-used subset as a tiny recursive-descent
parser that compiles ONE AST to SQL text, parameterized by a tag-reference
renderer — so the SAME parse drives BOTH engines:
  - Spark: tag ref renders as `tags['key']` and the result feeds F.expr(...)
    (fully Catalyst-native: the script becomes a codegen'd column expression,
    never a UDF), and
  - DuckDB (the oracle): tag ref renders via the flat-column map.

Supported grammar (CEL-compatible where it overlaps):
  literals        1, 2.5, 'str', "str", true, false, null
  tag access      feature.tags.key   |  feature.tags['key']
  operators       ?:  || && ! == != < <= > >= + - * / %
                  (`+` concatenates when either side is a string)
  functions       coalesce(a, b, ...)   nullif(a, b)
                  min(a, b)  max(a, b)        -> least/greatest
                  concat(a, b, ...)
                  replace(s, regex, rep)      -> regexp_replace
                  matches(s, regex)           -> regexp_like
                  has(feature.tags.key)       -> IS NOT NULL
                  long(x) double(x) string(x) -> casts (parse-forgiving for
                                                 tag strings, Parse.java)

Anything outside the subset raises CelError at profile-compile time (fail
fast at the driver, mirroring ConfigExpressionScript's create-time check).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

SCRIPT_RE = re.compile(r"^\s*\$\{(.*)}\s*$", re.S)
ESCAPED_RE = re.compile(r"^\s*\\+\$\{(.*)}\s*$", re.S)


class CelError(ValueError):
    pass


def is_script(obj) -> bool:
    """`${ ... }` detection (ConfigExpressionScript.isScript:44-50)."""
    return isinstance(obj, str) and SCRIPT_RE.match(obj) is not None


def is_escaped_script(obj) -> bool:
    return isinstance(obj, str) and ESCAPED_RE.match(obj) is not None


def unescape(s: str) -> str:
    """`\\${...}` -> literal `${...}` (ConfigExpressionScript:56-66)."""
    return s.replace("\\${", "${", 1)


# --- tokens -----------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>\|\||&&|==|!=|<=|>=|[?:()\[\],.+\-*/%<>!])
    )""", re.X)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise CelError(f"bad token at: {src[pos:pos + 20]!r}")
        pos = m.end()
        for kind in ("num", "str", "id", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("end", ""))
    return out


# --- AST --------------------------------------------------------------------
# Every node compiles to (sql_text, type) where type is 'str'|'num'|'bool'|'any'.

TagRef = Callable[[str], tuple[str, str]]  # key -> (sql, type)


@dataclass
class Env:
    """Compile environment: how to render a tag reference + the SQL dialect
    ('spark' | 'duckdb') for the few functions whose spelling differs.
    `vars` renders extra identifiers (Contexts.FeaturePostMatch:448-454
    provides `match_key`/`match_value` after a rule matches)."""
    tag: TagRef
    dialect: str = "spark"
    vars: dict | None = None  # name -> (sql, type)


@dataclass
class _Node:
    kind: str
    val: object = None
    kids: tuple = ()

    def sql(self, env: "Env") -> tuple[str, str]:
        k = self.kind
        if k == "num":
            return str(self.val), "num"
        if k == "str":
            body = str(self.val).replace("'", "''")
            return f"'{body}'", "str"
        if k == "bool":
            return ("TRUE" if self.val else "FALSE"), "bool"
        if k == "null":
            return "NULL", "any"
        if k == "tag":
            return env.tag(str(self.val))
        if k == "area":
            if not env.vars or "feature.area" not in env.vars:
                raise CelError("feature.area is not available in this "
                               "context (no geometry)")
            sql, _ = env.vars["feature.area"]
            div = {"m2": 1.0, "sqm": 1.0, "ha": 1e4,
                   "km2": 1e6, "sqkm": 1e6}.get(str(self.val))
            if div is None:
                raise CelError(f"unknown area unit {self.val!r}")
            return (sql if div == 1.0 else f"(({sql}) / {div!r})"), "num"
        if k == "var":
            if env.vars and str(self.val) in env.vars:
                return env.vars[str(self.val)]
            raise CelError(f"unknown identifier {self.val!r} (only "
                           "`feature.tags.*`, literals, calls"
                           + (", " + "/".join(sorted(env.vars)) if env.vars
                              else "") + " are supported)")
        if k == "not":
            s, _ = self.kids[0].sql(env)
            return f"(NOT COALESCE({s}, FALSE))", "bool"
        if k == "neg":
            s, _ = self.kids[0].sql(env)
            return f"(-({s}))", "num"
        if k == "bin":
            return self._bin_sql(env)
        if k == "ternary":
            c, _ = self.kids[0].sql(env)
            a, ta = self.kids[1].sql(env)
            b, tb = self.kids[2].sql(env)
            t = ta if ta == tb else "any"
            return f"(CASE WHEN COALESCE({c}, FALSE) THEN {a} ELSE {b} END)", t
        if k == "call":
            return self._call_sql(env)
        raise CelError(f"unknown node {k}")

    def _bin_sql(self, env: "Env") -> tuple[str, str]:
        op = str(self.val)
        a, ta = self.kids[0].sql(env)
        b, tb = self.kids[1].sql(env)
        if op == "+" and ("str" in (ta, tb)):
            return f"({a} || {b})", "str"
        if op in ("+", "-", "*", "/", "%"):
            return f"({a} {op} {b})", "num"
        if op in ("==", "!="):
            sqlop = "=" if op == "==" else "<>"
            return f"COALESCE({a} {sqlop} {b}, FALSE)", "bool"
        if op in ("<", "<=", ">", ">="):
            return f"COALESCE({a} {op} {b}, FALSE)", "bool"
        if op == "||":
            return f"(COALESCE({a}, FALSE) OR COALESCE({b}, FALSE))", "bool"
        if op == "&&":
            return f"(COALESCE({a}, FALSE) AND COALESCE({b}, FALSE))", "bool"
        raise CelError(f"unknown operator {op}")

    def _call_sql(self, env: "Env") -> tuple[str, str]:
        fn = str(self.val)
        if fn == "map" and len(self.kids) == 3:
            # CEL comprehension macro `list.map(x, expr)` -> a SQL
            # higher-order lambda (stays codegen'd in both engines)
            recv, rt = self.kids[0].sql(env)
            binder = self.kids[1]
            if binder.kind != "var":
                raise CelError("map(var, expr) needs a plain identifier")
            name = str(binder.val)
            inner = Env(env.tag, env.dialect,
                        {**(env.vars or {}), name: (name, "str")})
            body, _ = self.kids[2].sql(inner)
            hof = "list_transform" if env.dialect == "duckdb" else "transform"
            return f"{hof}({recv}, {name} -> {body})", "list"
        args = [kid.sql(env) for kid in self.kids]
        sqls = [a[0] for a in args]
        if fn == "coalesce":
            t = args[0][1] if args and all(a[1] == args[0][1] for a in args) else "any"
            return f"COALESCE({', '.join(sqls)})", t
        if fn == "nullif":
            return f"NULLIF({sqls[0]}, {sqls[1]})", args[0][1]
        if fn == "min":
            if len(args) == 1 and args[0][1] == "list":
                f = "list_min" if env.dialect == "duckdb" else "array_min"
                return f"{f}({sqls[0]})", "num"
            return f"LEAST({', '.join(sqls)})", "num"
        if fn == "max":
            if len(args) == 1 and args[0][1] == "list":
                f = "list_max" if env.dialect == "duckdb" else "array_max"
                return f"{f}({sqls[0]})", "num"
            return f"GREATEST({', '.join(sqls)})", "num"
        if fn == "split":
            # string.split(sep) with a LITERAL separator (cel-java strings
            # extension / Guava Splitter semantics: keeps empty segments)
            sep = self.kids[1]
            if sep.kind != "str":
                raise CelError("split() separator must be a string literal")
            if env.dialect == "duckdb":
                return f"string_split({sqls[0]}, {sqls[1]})", "list"
            # Spark's split() takes a REGEX: escape the literal; limit -1
            # keeps trailing empties like Splitter does
            rx = re.escape(str(sep.val)).replace("'", "''")
            return f"split({sqls[0]}, '{rx}', -1)", "list"
        if fn == "size":
            # CEL size(): string length or list length
            if args[0][1] == "list":
                f = "len" if env.dialect == "duckdb" else "size"
                return f"{f}({sqls[0]})", "num"
            return f"length({sqls[0]})", "num"
        if fn == "concat":
            return "(" + " || ".join(sqls) + ")", "str"
        if fn == "replace":
            # Spark regexp_replace is replace-ALL; DuckDB needs the 'g' flag
            if env.dialect == "duckdb":
                return f"regexp_replace({sqls[0]}, {sqls[1]}, {sqls[2]}, 'g')", "str"
            return f"regexp_replace({sqls[0]}, {sqls[1]}, {sqls[2]})", "str"
        if fn == "matches":
            # portable: both engines' regexp_extract returns '' on no match
            return f"(regexp_extract({sqls[0]}, {sqls[1]}, 0) <> '')", "bool"
        if fn == "has":
            return f"({sqls[0]} IS NOT NULL)", "bool"
        if fn == "long":
            # forgiving leading-integer parse (Parse.parseIntSubstring:73)
            return (f"CAST(nullif(regexp_extract({sqls[0]}, '^(-?[0-9]+)', 1), '') AS BIGINT)",
                    "num")
        if fn == "double":
            return (f"CAST(nullif(regexp_extract({sqls[0]}, '^(-?[0-9]+[.]?[0-9]*)', 1), '') AS DOUBLE)",
                    "num")
        if fn == "string":
            return f"CAST({sqls[0]} AS VARCHAR)", "str"
        raise CelError(f"unknown function {fn}()")


# --- parser -----------------------------------------------------------------

class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, val):
        k, v = self.next()
        if v != val:
            raise CelError(f"expected {val!r}, got {v!r}")

    def parse(self) -> _Node:
        node = self.expr()
        if self.peek()[0] != "end":
            raise CelError(f"trailing input at {self.peek()[1]!r}")
        return node

    def expr(self) -> _Node:
        cond = self.or_()
        if self.peek()[1] == "?":
            self.next()
            a = self.expr()
            self.eat(":")
            b = self.expr()
            return _Node("ternary", kids=(cond, a, b))
        return cond

    def or_(self) -> _Node:
        n = self.and_()
        while self.peek()[1] == "||":
            self.next()
            n = _Node("bin", "||", (n, self.and_()))
        return n

    def and_(self) -> _Node:
        n = self.cmp()
        while self.peek()[1] == "&&":
            self.next()
            n = _Node("bin", "&&", (n, self.cmp()))
        return n

    def cmp(self) -> _Node:
        n = self.add()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            n = _Node("bin", op, (n, self.add()))
        return n

    def add(self) -> _Node:
        n = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            n = _Node("bin", op, (n, self.mul()))
        return n

    def mul(self) -> _Node:
        n = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            n = _Node("bin", op, (n, self.unary()))
        return n

    def unary(self) -> _Node:
        if self.peek()[1] == "!":
            self.next()
            return _Node("not", kids=(self.unary(),))
        if self.peek()[1] == "-":
            self.next()
            return _Node("neg", kids=(self.unary(),))
        return self.primary()

    def primary(self) -> _Node:
        return self._postfix(self._primary())

    def _postfix(self, node: _Node) -> _Node:
        """CEL string methods: `expr.replace(a, b)` / `expr.matches(re)`
        desugar to the function with the receiver as first argument."""
        while (self.i + 2 < len(self.toks)
               and self.peek()[1] == "." and self.toks[self.i + 1][0] == "id"
               and self.toks[self.i + 2][1] == "("):
            self.next()
            _, method = self.next()
            self.eat("(")
            args = [node]
            if self.peek()[1] != ")":
                args.append(self.expr())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.expr())
            self.eat(")")
            node = _Node("call", method, tuple(args))
        return node

    def _primary(self) -> _Node:
        kind, v = self.next()
        if kind == "num":
            return _Node("num", v)
        if kind == "str":
            body = v[1:-1].replace("\\'", "'").replace('\\"', '"')
            return _Node("str", body)
        if kind == "id":
            if v == "true":
                return _Node("bool", True)
            if v == "false":
                return _Node("bool", False)
            if v == "null":
                return _Node("null")
            if v == "feature":
                return self._feature_path()
            if self.peek()[1] == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.expr())
                self.eat(")")
                return _Node("call", v, tuple(args))
            # environment variable (match_key/match_value, ...): resolved at
            # sql() time against Env.vars — still a driver-compile-time check
            return _Node("var", v)
        if v == "(":
            n = self.expr()
            self.eat(")")
            return n
        raise CelError(f"unexpected {v!r}")

    def _feature_path(self) -> _Node:
        self.eat(".")
        k, v = self.next()
        if v == "area":
            # feature.area('m2'|'ha'|'km2') — spherical polygon area
            # (PlanetilerStdLib.java:184-190 -> GeoUtils.ringAreaMeters:665)
            unit = "m2"
            if self.peek()[1] == "(":
                self.next()
                if self.peek()[0] == "str":
                    unit = self.next()[1][1:-1]
                self.eat(")")
            return _Node("area", unit)
        if v != "tags":
            raise CelError(f"only feature.tags.* is supported, got feature.{v}")
        nxt = self.peek()[1]
        if nxt == ".":
            self.next()
            k2, key = self.next()
            if k2 != "id":
                raise CelError("expected tag name after feature.tags.")
            if key == "get" and self.peek()[1] == "(":
                # CEL map getter: feature.tags.get("key")
                self.next()
                k3, arg = self.next()
                if k3 != "str":
                    raise CelError("expected string key in feature.tags.get()")
                self.eat(")")
                return _Node("tag", arg[1:-1])
            return _Node("tag", key)
        if nxt == "[":
            self.next()
            k2, key = self.next()
            if k2 != "str":
                raise CelError("expected string key in feature.tags[...]")
            self.eat("]")
            return _Node("tag", key[1:-1])
        raise CelError("expected .key or ['key'] after feature.tags")


def compile_script(text: str) -> _Node:
    """`${ expr }` (or bare expr) -> AST; raises CelError on anything
    outside the subset."""
    m = SCRIPT_RE.match(text)
    body = m.group(1) if m else text
    return _Parser(_tokenize(body)).parse()


def script_sql(text: str, tagref: TagRef, dialect: str = "spark",
               vars: dict | None = None) -> str:
    return compile_script(text).sql(Env(tagref, dialect, vars))[0]
