"""SQL boolean-expression text → the engine Expression DSL.

Powers the SQL front end's DML statements (``DELETE FROM ... WHERE``,
``UPDATE ... WHERE``): the WHERE clause parses into the SAME
:mod:`plans.expressions` tree the Python API takes, so a SQL delete
gets exactly the engine's partition/metrics pruning and manifest
carry-filtering — compiling the text straight to a Spark ``Column``
would lose the metadata plane.

Deliberately a RESTRICTED grammar — the subset the Expression DSL can
represent (the reference's expression surface, ``expression.h``):

    pred   := or_expr
    or     := and (OR and)*
    and    := unary (AND unary)*
    unary  := NOT unary | '(' pred ')' | comparison | TRUE | FALSE
    cmp    := term (= | != | <> | < | <= | > | >=) literal
            | literal (op) term                       -- flipped
            | term IS [NOT] NULL | term IS [NOT] NAN
            | term [NOT] IN '(' literal (',' literal)* ')'
            | term [NOT] BETWEEN literal AND literal
            | term [NOT] LIKE 'prefix%'               -- prefix-only
    term   := column
            | bucket '(' column ',' N ')' | truncate '(' column ',' W ')'
            -- year/month/day/hour are REFUSED: the Iceberg transform
            -- yields ordinals since 1970, Spark's function the
            -- calendar value — a silent mismatch; range predicates on
            -- the column prune temporal partitions identically
    literal:= 'str' | number | TRUE | FALSE
            | DATE 'yyyy-mm-dd' | TIMESTAMP 'iso'

Everything else (column-vs-column comparisons, arithmetic, general
LIKE patterns, subqueries) raises ``SqlParseError`` LOUDLY — those
belong to Spark's full SQL surface via ``IceSqlEngine.sql`` reads, not
to a pruning predicate. Scale shape: O(clause text) driver work; the
output is a plain unbound Expression, costing nothing until bound.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any, Optional

from . import expressions as ex
from ..functions import transforms as tr

__all__ = ["parse_predicate", "SqlParseError"]


class SqlParseError(ValueError):
    """The text is outside the prunable-predicate grammar."""


_TOKEN = re.compile(r"""
    \s*(?:
      (?P<str>'(?:[^']|'')*')
    | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<ident>[A-Za-z_]\w*)
    | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\.|-)
    )""", re.X)

_KEYWORDS = {"and", "or", "not", "in", "between", "is", "null", "nan",
             "true", "false", "like", "date", "timestamp"}
# year/month/day/hour are REFUSED, not parsed: the Iceberg transforms
# yield ordinals since 1970 while the same spelling in Spark SQL is
# the calendar function — `year(ts) = 2020` would silently compare
# 2020 against ordinal 50 and match nothing. A plain range predicate
# on the column prunes temporal partitions identically (inclusive
# projection), so nothing is lost by refusing.
_TEMPORAL_REFUSED = {"year", "month", "day", "hour"}
_TRANSFORMS_2 = {"bucket": tr.BucketTransform,
                 "truncate": tr.TruncateTransform}
_CMP = {"=": ex.eq, "!=": ex.not_eq, "<>": ex.not_eq, "<": ex.lt,
        "<=": ex.lt_eq, ">": ex.gt, ">=": ex.gt_eq}
_FLIP = {"=": "=", "!=": "!=", "<>": "<>",
         "<": ">", "<=": ">=", ">": "<", ">=": "<="}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip():
                raise SqlParseError(
                    f"cannot tokenize predicate at: {text[pos:pos+30]!r}")
            break
        pos = m.end()
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("ident") is not None:
            out.append(("ident", m.group("ident")))
        else:
            out.append(("op", m.group("op")))
    return out


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers -----------------------------------------------------
    def _peek(self, k: int = 0) -> Optional[tuple[str, str]]:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        t = self._peek()
        if t is None:
            raise SqlParseError(f"unexpected end of predicate: {self.text!r}")
        self.i += 1
        return t

    def _kw(self, *words: str) -> bool:
        """Consume the keyword if it is next; return whether it was."""
        t = self._peek()
        if t and t[0] == "ident" and t[1].lower() in words:
            self.i += 1
            return True
        return False

    def _expect_op(self, op: str) -> None:
        t = self._next()
        if t != ("op", op):
            raise SqlParseError(
                f"expected {op!r}, got {t[1]!r} in {self.text!r}")

    # -- grammar -----------------------------------------------------------
    def parse(self) -> ex.Expression:
        e = self._or()
        if self._peek() is not None:
            raise SqlParseError(
                f"trailing input after predicate: {self.toks[self.i:]} "
                f"in {self.text!r}")
        return e

    def _or(self) -> ex.Expression:
        e = self._and()
        while self._kw("or"):
            e = ex.or_(e, self._and())
        return e

    def _and(self) -> ex.Expression:
        e = self._unary()
        while self._kw("and"):
            e = ex.and_(e, self._unary())
        return e

    def _unary(self) -> ex.Expression:
        if self._kw("not"):
            return ex.not_(self._unary())
        t = self._peek()
        if t == ("op", "("):
            self.i += 1
            e = self._or()
            self._expect_op(")")
            return e
        if t and t[0] == "ident" and t[1].lower() in ("true", "false"):
            self.i += 1
            return ex.TrueExp() if t[1].lower() == "true" else ex.FalseExp()
        return self._comparison()

    def _comparison(self) -> ex.Expression:
        # literal on the left: `5 < x` — flip once, recurse is not needed
        if self._literal_ahead():
            lit = self._literal()
            t = self._next()
            if t[0] != "op" or t[1] not in _FLIP:
                raise SqlParseError(
                    f"literal must be compared to a column "
                    f"(got {t[1]!r}) in {self.text!r}")
            term = self._term()
            return _CMP[_FLIP[t[1]]](term, lit)

        term = self._term()
        neg = self._kw("not")
        if self._kw("in"):
            self._expect_op("(")
            vals = [self._literal()]
            while self._peek() == ("op", ","):
                self.i += 1
                vals.append(self._literal())
            self._expect_op(")")
            return ex.not_in(term, vals) if neg else ex.in_(term, vals)
        if self._kw("between"):
            lo = self._literal()
            if not self._kw("and"):
                raise SqlParseError(f"BETWEEN needs AND in {self.text!r}")
            hi = self._literal()
            e = ex.and_(ex.gt_eq(term, lo), ex.lt_eq(term, hi))
            return ex.not_(e) if neg else e
        if self._kw("like"):
            t = self._next()
            if t[0] != "str":
                raise SqlParseError(
                    f"LIKE needs a string literal in {self.text!r}")
            pat = t[1]
            body = pat[:-1] if pat.endswith("%") else None
            if body is None or re.search(r"[%_]", body):
                raise SqlParseError(
                    f"only prefix LIKE 'abc%' is prunable; got {pat!r} "
                    "(run general patterns through engine.sql reads)")
            return (ex.not_starts_with(term, body) if neg
                    else ex.starts_with(term, body))
        if neg:
            raise SqlParseError(
                f"NOT must precede IN/BETWEEN/LIKE in {self.text!r}")
        if self._kw("is"):
            neg = self._kw("not")
            if self._kw("null"):
                return ex.not_null(term) if neg else ex.is_null(term)
            if self._kw("nan"):
                return ex.not_nan(term) if neg else ex.is_nan(term)
            raise SqlParseError(f"IS must end NULL or NAN in {self.text!r}")
        t = self._next()
        if t[0] == "op" and t[1] in _CMP:
            if not self._literal_ahead(operand=True):
                nxt = self._peek()
                raise SqlParseError(
                    "comparisons bind a column to a LITERAL "
                    f"(got {nxt and nxt[1]!r}); column-vs-column filters "
                    "belong in engine.sql reads, not pruning predicates")
            return _CMP[t[1]](term, self._literal())
        raise SqlParseError(
            f"expected a comparison after {self._term_repr(term)} "
            f"in {self.text!r}")

    @staticmethod
    def _term_repr(term) -> str:
        return getattr(term, "name", None) or repr(term)

    def _term(self):
        t = self._next()
        if t[0] != "ident":
            raise SqlParseError(
                f"expected a column or transform, got {t[1]!r} "
                f"in {self.text!r}")
        name = t[1]
        low = name.lower()
        if self._peek() == ("op", "(") and low in _TEMPORAL_REFUSED:
            raise SqlParseError(
                f"{low}(col) is ambiguous here: Spark's {low}() is the "
                f"calendar function but Iceberg's {low} transform "
                "yields ordinals since 1970 — write a range predicate "
                "on the column instead (it prunes temporal partitions "
                "identically)")
        if self._peek() == ("op", "(") and low in _TRANSFORMS_2:
            self.i += 1
            col = self._dotted_name()
            self._expect_op(",")
            n = self._next()
            if n[0] != "num" or "." in n[1]:
                raise SqlParseError(
                    f"{low} needs an integer argument in {self.text!r}")
            self._expect_op(")")
            return ex.TransformTerm(_TRANSFORMS_2[low](int(n[1])),
                                    ex.Reference(col))
        if low in _KEYWORDS:
            raise SqlParseError(
                f"keyword {name!r} cannot start a term in {self.text!r}")
        return ex.Reference(self._dotted_rest(name))

    def _dotted_name(self) -> str:
        t = self._next()
        if t[0] != "ident":
            raise SqlParseError(
                f"expected a column name, got {t[1]!r} in {self.text!r}")
        return self._dotted_rest(t[1])

    def _dotted_rest(self, first: str) -> str:
        parts = [first]
        while self._peek() == ("op", ".") \
                and (nxt := self._peek(1)) and nxt[0] == "ident":
            self.i += 2
            parts.append(nxt[1])
        return ".".join(parts)

    # -- literals ------------------------------------------------------------
    def _literal_ahead(self, operand: bool = False) -> bool:
        """``operand=True`` means we are PAST a comparison operator, so
        TRUE/FALSE can only be literals; at expression start they are
        standalone booleans (handled by _unary) unless an operator
        follows them."""
        t = self._peek()
        if t is None:
            return False
        if t[0] in ("str", "num"):
            return True
        if t == ("op", "-"):
            return True
        if t[0] == "ident":
            low = t[1].lower()
            if low in ("true", "false"):
                if operand:
                    return True
                nxt = self._peek(1)
                return nxt is not None and nxt[0] == "op" \
                    and nxt[1] in _FLIP
            if low in ("date", "timestamp"):
                nxt = self._peek(1)
                return nxt is not None and nxt[0] == "str"
        return False

    def _literal(self) -> Any:
        t = self._next()
        if t[0] == "str":
            return t[1]
        if t[0] == "num":
            return self._num(t[1])
        if t == ("op", "-"):
            n = self._next()
            if n[0] != "num":
                raise SqlParseError(
                    f"expected a number after '-' in {self.text!r}")
            return -self._num(n[1])
        if t[0] == "ident":
            low = t[1].lower()
            if low == "true":
                return True
            if low == "false":
                return False
            if low in ("date", "timestamp"):
                s = self._next()
                if s[0] != "str":
                    raise SqlParseError(
                        f"{low.upper()} needs a quoted literal "
                        f"in {self.text!r}")
                try:
                    if low == "date":
                        return _dt.date.fromisoformat(s[1])
                    return _dt.datetime.fromisoformat(s[1])
                except ValueError as e:
                    raise SqlParseError(
                        f"bad {low.upper()} literal {s[1]!r}: {e}") from None
        raise SqlParseError(
            f"expected a literal, got {t[1]!r} in {self.text!r}")

    @staticmethod
    def _num(text: str):
        return float(text) if ("." in text or "e" in text.lower()) else int(text)


def parse_predicate(text: str) -> ex.Expression:
    """Parse a SQL WHERE-clause body into an unbound Expression.

    >>> parse_predicate("o_orderdate >= DATE '1995-01-01' AND region IN ('EU', 'US')")
    """
    if not text or not text.strip():
        raise SqlParseError("empty predicate")
    return _Parser(text).parse()
