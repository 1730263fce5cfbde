"""The ``sdvattribute.sqlwhereclause`` mini-dialect → Column expression.

The reference pushes these fragments verbatim into geodatabase cursors
(applied gSSURGO_CreateSoilMap.py:10135-10136, case-rewritten for FGDB
at :3740-3763). The observed grammar is tiny: qualified/unqualified
column names, string/number literals, ``=``, ``<>``, ``!=``, ``<``,
``<=``, ``>``, ``>=``, ``IN (...)``, ``LIKE``, ``IS [NOT] NULL``,
``AND``/``OR``/``NOT`` and parentheses. Parsed with a recursive-descent
parser — never ``eval``/raw SQL injection — into a pyspark Column.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad whereclause at {s[pos:pos+20]!r}")
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_word(self, word: str) -> None:
        k, v = self.take()
        if k != "word" or v.upper() != word:
            raise ValueError(f"expected {word}, got {v!r}")

    # expr := term (OR term)*
    def expr(self) -> Column:
        left = self.term()
        while self._is_word("OR"):
            self.take()
            left = left | self.term()
        return left

    # term := factor (AND factor)*
    def term(self) -> Column:
        left = self.factor()
        while self._is_word("AND"):
            self.take()
            left = left & self.factor()
        return left

    def _is_word(self, w: str) -> bool:
        t = self.peek()
        return t is not None and t[0] == "word" and t[1].upper() == w

    def factor(self) -> Column:
        if self._is_word("NOT"):
            self.take()
            return ~self.factor()
        t = self.peek()
        if t and t[0] == "lpar":
            self.take()
            e = self.expr()
            k, _ = self.take()
            if k != "rpar":
                raise ValueError("unbalanced parens")
            return e
        return self.predicate()

    def predicate(self) -> Column:
        k, name = self.take()
        if k != "word":
            raise ValueError(f"expected column name, got {name!r}")
        col = F.col(name.split(".")[-1].lower())
        t = self.peek()
        if t is None:
            raise ValueError("dangling column reference")
        if t[0] == "word" and t[1].upper() == "IS":
            self.take()
            negate = False
            if self._is_word("NOT"):
                self.take()
                negate = True
            self.expect_word("NULL")
            return col.isNotNull() if negate else col.isNull()
        if t[0] == "word" and t[1].upper() in ("IN", "NOT"):
            negate = t[1].upper() == "NOT"
            self.take()
            if negate:
                self.expect_word("IN")
            k, _ = self.take()
            if k != "lpar":
                raise ValueError("IN requires (")
            vals = []
            while True:
                k, v = self.take()
                if k == "str":
                    vals.append(v[1:-1].replace("''", "'"))
                elif k == "num":
                    vals.append(float(v) if "." in v else int(v))
                else:
                    raise ValueError(f"bad IN literal {v!r}")
                k, v = self.take()
                if k == "rpar":
                    break
                if k != "comma":
                    raise ValueError("bad IN list")
            e = col.isin(vals)
            return ~e if negate else e
        if t[0] == "word" and t[1].upper() == "LIKE":
            self.take()
            k, v = self.take()
            if k != "str":
                raise ValueError("LIKE requires a string")
            return col.like(v[1:-1].replace("''", "'"))
        k, op = self.take()
        if k != "op":
            raise ValueError(f"expected operator, got {op!r}")
        k, v = self.take()
        if k == "str":
            val = v[1:-1].replace("''", "'")
        elif k == "num":
            val = float(v) if "." in v else int(v)
        else:
            raise ValueError(f"bad literal {v!r}")
        return {
            "=": col == val,
            "<>": col != val,
            "!=": col != val,
            "<": col < val,
            "<=": col <= val,
            ">": col > val,
            ">=": col >= val,
        }[op]


def parse_where(clause: str) -> Column:
    """Parse a sqlwhereclause fragment into a Column predicate."""
    p = _Parser(_tokenize(clause))
    e = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in {clause!r}")
    return e
