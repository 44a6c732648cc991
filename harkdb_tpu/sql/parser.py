"""Hand-written SQL lexer + recursive-descent parser.

Replaces the reference's ``moz_sql_parser`` dependency (``parse.py:27``) with a
zero-dependency parser for the engine's grammar:

    [ WITH name AS ( compound_select ) [, ...] ]
    compound_select := select_core
        [ {UNION [ALL] | INTERSECT | EXCEPT} select_core ]*
        [ ORDER BY expr [ASC|DESC] [NULLS FIRST|LAST], ... | SORT BY ... ]
        [ LIMIT n ] [ OFFSET m ]
    select_core := SELECT [DISTINCT] select_list
        FROM table_or_derived [alias]
        [ {INNER|LEFT|RIGHT|FULL [OUTER]|CROSS} JOIN table_or_derived
          [alias] ON cond [AND cond]* ]*       -- equalities are join keys,
                                               -- non-equi terms lower to
                                               -- WHERE on inner joins
        [ WHERE expr ] [ GROUP BY expr, ... ] [ HAVING expr ]

Expression grammar (precedence climbing): OR < AND < NOT < comparison
(= == != <> < <= > >=, IS [NOT] NULL, [NOT] IN / BETWEEN / LIKE / ILIKE)
< additive (+ -) < multiplicative (* / %) < unary minus < primary
(literal, [table.]column, aggregate / window / scalar / string function
call, CASE in both forms, CAST, COALESCE, EXISTS, (sub)query,
parenthesized expr).

Case-insensitive keywords; identifiers keep their case (reference schema
lookup is exact-match, ``parse.py:9-13``).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from harkdb_tpu.sql.ast_nodes import (
    Agg, BinOp, Case, Col, ExistsSub, InSub, JoinClause, Lit, OrderItem,
    SelectItem, SelectStmt, Star, SubQuery, TableRef, UnionStmt, UnOp,
    WindowFn,
)


class SqlError(Exception):
    """Parse-time SQL error (syntax)."""


KEYWORDS = {
    "select", "from", "where", "group", "order", "sort", "by", "having",
    "limit", "offset", "join", "inner", "left", "right", "outer", "full",
    "cross", "on", "as", "and",
    "or", "not", "asc", "desc", "distinct", "in", "between", "like",
    "case", "when", "then", "else", "end", "union", "intersect", "except",
    "ilike",
    "all",
    "over", "partition", "is", "null",
    "rows", "range", "unbounded", "preceding", "following", "current", "row",
    "exists", "cast", "nulls", "with",
}

AGG_FUNCS = {"sum", "prod", "max", "min", "count", "avg",
             "stddev", "variance", "stddev_samp", "var_samp",
             "stddev_pop", "var_pop", "median"}
# grouped-only aggregates (no window form)
VAR_AGG_FUNCS = {"stddev", "variance", "stddev_samp", "var_samp",
                 "stddev_pop", "var_pop", "median"}
# lowered to UnOp(func, arg); floor/ceil/round are identity on ints
SCALAR_FUNCS = {"abs", "floor", "ceil", "round", "sqrt"}
# string scalar functions — plan-time dictionary transforms (StrFunc →
# CodeMap in plan/strings.py); substr takes (expr, start [, length])
STR_FUNCS = {"upper", "lower", "trim", "length", "substr", "substring"}
WINDOW_ONLY_FUNCS = {"row_number", "rank", "dense_rank", "percent_rank",
                     "cume_dist"}                          # require OVER
# positional window funcs with an argument; lag/lead take optional
# (offset, default) numeric literals; nth_value takes a 1-based position
WINDOW_ARG_FUNCS = {"lag", "lead", "first_value", "last_value",
                    "nth_value"}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<num>\d+\.\d*|\.\d+|\d+)
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op><>|!=|==|<=|>=|=|<|>|\+|-|\*|/|%|\(|\)|,|\.)
    """,
    re.VERBOSE,
)


class Token:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind          # "num" | "ident" | "kw" | "op" | "eof"
        self.text = text

    def __repr__(self):
        return f"Token({self.kind},{self.text!r})"


def tokenize(sql: str) -> List[Token]:
    tokens: List[Token] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise SqlError(f"Unexpected character {sql[pos]!r} at position {pos}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if m.lastgroup == "ident":
            low = text.lower()
            tokens.append(Token("kw" if low in KEYWORDS else "ident", text))
        elif m.lastgroup == "str":
            # SQL string literal: strip quotes, unescape doubled ''.
            tokens.append(Token("str", text[1:-1].replace("''", "'")))
        else:
            tokens.append(Token(m.lastgroup, text))
    tokens.append(Token("eof", ""))
    return tokens


class Parser:
    def __init__(self, tokens: List[Token]):
        self.tokens = tokens
        self.i = 0

    # -- token helpers --------------------------------------------------------
    def peek(self) -> Token:
        return self.tokens[self.i]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text.lower() in words

    def eat_kw(self, word: str) -> bool:
        if self.at_kw(word):
            self.next()
            return True
        return False

    def expect_kw(self, word: str):
        if not self.eat_kw(word):
            raise SqlError(f"Expected {word.upper()}, got {self.peek().text!r}")

    def eat_op(self, op: str) -> bool:
        t = self.peek()
        if t.kind == "op" and t.text == op:
            self.next()
            return True
        return False

    def expect_op(self, op: str):
        if not self.eat_op(op):
            raise SqlError(f"Expected {op!r}, got {self.peek().text!r}")

    def expect_ident(self) -> str:
        t = self.peek()
        if t.kind != "ident":
            raise SqlError(f"Expected identifier, got {t.text!r}")
        return self.next().text

    # -- statement ------------------------------------------------------------
    def parse_select_core(self) -> SelectStmt:
        """One SELECT arm: everything up to (not including) ORDER BY / LIMIT /
        OFFSET / UNION — those trail the whole statement."""
        self.expect_kw("select")
        distinct = self.eat_kw("distinct")
        items = self.parse_select_list()
        self.expect_kw("from")
        table = self.parse_table_ref()
        joins = []
        while self.at_kw("join", "inner", "left", "right", "full", "cross"):
            joins.append(self.parse_join())
        where = None
        if self.eat_kw("where"):
            where = self.parse_expr()
        group_by = ()
        if self.at_kw("group"):
            self.next()
            self.expect_kw("by")
            # full expressions (engine extension; the planner materializes
            # non-column keys as hidden computed columns)
            exprs = [self.parse_expr()]
            while self.eat_op(","):
                exprs.append(self.parse_expr())
            group_by = tuple(exprs)
        having = None
        if self.eat_kw("having"):
            having = self.parse_expr()
        return SelectStmt(
            items=tuple(items), table=table, joins=tuple(joins), where=where,
            group_by=group_by, having=having, order_by=(), limit=None,
            offset=None, distinct=distinct,
        )

    def _parse_order_limit_offset(self):
        order_by: Tuple[OrderItem, ...] = ()
        if self.at_kw("order", "sort"):
            self.next()
            self.expect_kw("by")
            order = [self.parse_order_item()]
            while self.eat_op(","):
                order.append(self.parse_order_item())
            order_by = tuple(order)
        limit = None
        if self.eat_kw("limit"):
            t = self.peek()
            if t.kind != "num" or "." in t.text:
                raise SqlError(f"LIMIT expects an integer, got {t.text!r}")
            limit = int(self.next().text)
        offset = None
        if self.eat_kw("offset"):
            t = self.peek()
            if t.kind != "num" or "." in t.text:
                raise SqlError(f"OFFSET expects an integer, got {t.text!r}")
            offset = int(self.next().text)
        return order_by, limit, offset

    def parse_select(self):
        """Full statement: a compound select followed by end-of-input."""
        return self.parse_compound_select()

    def parse_compound_select(self):
        """SELECT arm(s) joined by UNION [ALL] / INTERSECT / EXCEPT, then
        [ORDER BY ...] [LIMIT n] [OFFSET m]. Returns SelectStmt or
        UnionStmt. Used for the top-level statement AND for view / CTE /
        derived-table / IN-subquery bodies (set operations compose
        anywhere a SELECT does)."""
        arms = [self.parse_select_core()]
        ops = []
        while self.at_kw("union", "intersect", "except"):
            kw = self.next().text.lower()
            if kw == "union":
                ops.append("union all" if self.eat_kw("all") else "union")
            else:
                if self.eat_kw("all"):
                    raise SqlError(
                        f"{kw.upper()} ALL is not supported (distinct "
                        f"{kw.upper()} only)"
                    )
                ops.append(kw)
            arms.append(self.parse_select_core())
        order_by, limit, offset = self._parse_order_limit_offset()
        if len(arms) == 1:
            s = arms[0]
            return SelectStmt(
                items=s.items, table=s.table, joins=s.joins, where=s.where,
                group_by=s.group_by, having=s.having, order_by=order_by,
                limit=limit, offset=offset, distinct=s.distinct,
            )
        return UnionStmt(
            arms=tuple(arms), ops=tuple(ops), order_by=order_by,
            limit=limit, offset=offset,
        )

    def parse_select_list(self) -> List[SelectItem]:
        items = [self.parse_select_item()]
        while self.eat_op(","):
            items.append(self.parse_select_item())
        return items

    def parse_select_item(self) -> SelectItem:
        if self.eat_op("*"):
            return SelectItem(Star())
        # "t.*"
        if (
            self.peek().kind == "ident"
            and self.tokens[self.i + 1].kind == "op"
            and self.tokens[self.i + 1].text == "."
            and self.tokens[self.i + 2].kind == "op"
            and self.tokens[self.i + 2].text == "*"
        ):
            t = self.next().text
            self.next()
            self.next()
            return SelectItem(Star(table=t))
        expr = self.parse_expr()
        alias = None
        if self.eat_kw("as"):
            alias = self.expect_ident()
        elif self.peek().kind == "ident":
            alias = self.next().text
        return SelectItem(expr, alias)

    def parse_table_ref(self):
        # FROM (SELECT ...) alias — a derived table (alias mandatory).
        if self.eat_op("("):
            stmt = self.parse_compound_select()
            self.expect_op(")")
            alias = None
            if self.eat_kw("as"):
                alias = self.expect_ident()
            elif self.peek().kind == "ident":
                alias = self.next().text
            if alias is None:
                raise SqlError("A derived table requires an alias")
            from harkdb_tpu.sql.ast_nodes import DerivedRef

            return DerivedRef(stmt, alias)
        name = self.expect_ident()
        alias = None
        if self.eat_kw("as"):
            alias = self.expect_ident()
        elif self.peek().kind == "ident":
            alias = self.next().text
        return TableRef(name, alias)

    def parse_join(self) -> JoinClause:
        kind = "inner"
        if self.eat_kw("inner"):
            pass
        elif self.eat_kw("left"):
            self.eat_kw("outer")
            kind = "left"
        elif self.eat_kw("right"):
            self.eat_kw("outer")
            kind = "right"
        elif self.eat_kw("full"):
            self.eat_kw("outer")
            kind = "full"
        elif self.eat_kw("cross"):
            self.expect_kw("join")
            return JoinClause(table=self.parse_table_ref(), conds=(),
                              kind="cross")
        self.expect_kw("join")
        table = self.parse_table_ref()
        self.expect_kw("on")
        # ON is an AND-conjunction; column equalities become sort keys
        # (multi-key equi-join), anything else is a RESIDUAL predicate —
        # for INNER joins it lowers into WHERE (equivalent by relational
        # algebra); outer joins reject residuals (they would change which
        # rows count as matched — planner-enforced).
        conds = []
        residuals = []
        while True:
            e = self.parse_and_term_for_on()
            if (isinstance(e, BinOp) and e.op == "="
                    and isinstance(e.left, Col)
                    and isinstance(e.right, Col)):
                conds.append((e.left, e.right))
            else:
                residuals.append(e)
            if not self.eat_kw("and"):
                break
        if self.at_kw("or"):
            raise SqlError(
                "JOIN ... ON must be an AND-combined condition list "
                "(no top-level OR)"
            )
        if not conds:
            raise SqlError(
                "JOIN ... ON needs at least one column equality (the "
                "equi-join key); purely non-equi joins are not supported "
                "— use CROSS JOIN + WHERE"
            )
        return JoinClause(table=table, conds=tuple(conds), kind=kind,
                          residuals=tuple(residuals))

    def parse_and_term_for_on(self):
        """One AND-term of an ON condition: a comparison-level expression
        (no top-level AND/OR — the caller owns the conjunction)."""
        return self.parse_not()

    def parse_qualified_col(self) -> Col:
        name = self.expect_ident()
        if self.eat_op("."):
            return Col(self.expect_ident(), table=name)
        return Col(name)

    def parse_order_item(self) -> OrderItem:
        expr = self.parse_expr()
        desc = False
        if self.eat_kw("desc"):
            desc = True
        else:
            self.eat_kw("asc")
        nulls = None
        if self.eat_kw("nulls"):
            t = self.peek()
            if t.kind == "ident" and t.text.lower() in ("first", "last"):
                nulls = self.next().text.lower()
            else:
                raise SqlError(
                    f"Expected FIRST or LAST after NULLS, got {t.text!r}"
                )
        return OrderItem(expr, desc, nulls)

    # -- expressions ----------------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.eat_kw("or"):
            left = BinOp("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.eat_kw("and"):
            left = BinOp("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.eat_kw("not"):
            return UnOp("not", self.parse_not())
        return self.parse_cmp()

    _CMP = {"=": "=", "==": "=", "!=": "!=", "<>": "!=",
            "<": "<", "<=": "<=", ">": ">", ">=": ">="}

    def parse_cmp(self):
        left = self.parse_add()
        # x IS [NOT] NULL — the planner lowers to the LEFT-JOIN matched
        # flag (false/true everywhere else: only unmatched LEFT-JOIN rows
        # are NULL in this engine's model).
        if self.eat_kw("is"):
            neg_null = self.eat_kw("not")
            self.expect_kw("null")
            e = UnOp("isnull", left)
            return UnOp("not", e) if neg_null else e
        # x [NOT] IN (v, ...)  — desugared to an OR-chain of equalities.
        negate = False
        if self.at_kw("not"):
            nxt = self.tokens[self.i + 1]
            if nxt.kind == "kw" and nxt.text.lower() in ("in", "between",
                                                         "like", "ilike"):
                self.next()
                negate = True
        if self.eat_kw("in"):
            self.expect_op("(")
            if self.at_kw("select"):           # x [NOT] IN (SELECT ...)
                sub = SubQuery(self.parse_compound_select())
                self.expect_op(")")
                return InSub(left, sub, negate)
            exprs = [self.parse_expr()]
            while self.eat_op(","):
                exprs.append(self.parse_expr())
            self.expect_op(")")
            chain = BinOp("=", left, exprs[0])
            for e in exprs[1:]:
                chain = BinOp("or", chain, BinOp("=", left, e))
            return UnOp("not", chain) if negate else chain
        # x [NOT] BETWEEN lo AND hi — desugared to lo <= x AND x <= hi.
        if self.eat_kw("between"):
            lo = self.parse_add()
            self.expect_kw("and")
            hi = self.parse_add()
            rng = BinOp("and", BinOp(">=", left, lo), BinOp("<=", left, hi))
            return UnOp("not", rng) if negate else rng
        # x [NOT] LIKE 'pattern' — pattern must be a string literal; the
        # planner lowers it against the column's dictionary (range OR-chain
        # when the matching codes are contiguous runs, LUT membership else).
        if self.at_kw("like", "ilike"):
            op = self.next().text.lower()
            t = self.peek()
            if t.kind != "str":
                raise SqlError(
                    f"{op.upper()} expects a string literal pattern, "
                    f"got {t.text!r}"
                )
            e = BinOp(op, left, Lit(self.next().text))
            return UnOp("not", e) if negate else e
        if negate:
            raise SqlError("Expected IN, BETWEEN or LIKE after NOT")
        t = self.peek()
        if t.kind == "op" and t.text in self._CMP:
            op = self._CMP[self.next().text]
            return BinOp(op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while True:
            if self.eat_op("+"):
                left = BinOp("+", left, self.parse_mul())
            elif self.eat_op("-"):
                left = BinOp("-", left, self.parse_mul())
            else:
                return left

    def parse_mul(self):
        left = self.parse_unary()
        while True:
            if self.eat_op("*"):
                left = BinOp("*", left, self.parse_unary())
            elif self.eat_op("/"):
                left = BinOp("/", left, self.parse_unary())
            elif self.eat_op("%"):
                left = BinOp("%", left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        if self.eat_op("-"):
            return UnOp("-", self.parse_unary())
        return self.parse_primary()

    def parse_primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            return Lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "str":
            self.next()
            return Lit(t.text)
        if self.eat_op("("):
            if self.at_kw("select"):           # scalar subquery
                sub = SubQuery(self.parse_compound_select())
                self.expect_op(")")
                return sub
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if self.at_kw("case"):
            return self.parse_case()
        if self.eat_kw("exists"):       # EXISTS (SELECT ...); NOT EXISTS
            self.expect_op("(")         # arrives as UnOp("not", ExistsSub)
            stmt = self.parse_subquery_stmt()
            self.expect_op(")")
            return ExistsSub(stmt)
        if self.eat_kw("cast"):         # CAST(expr AS INT|FLOAT)
            self.expect_op("(")
            e = self.parse_expr()
            self.expect_kw("as")
            ty = self.expect_ident().lower()
            self.expect_op(")")
            if ty in ("int", "integer", "bigint", "smallint"):
                return UnOp("cast_int", e)
            if ty in ("float", "double", "real", "numeric", "decimal"):
                return UnOp("cast_float", e)
            raise SqlError(
                f"CAST target must be an int or float type, got {ty!r}"
            )
        if t.kind == "ident":
            low = t.text.lower()
            nxt = self.tokens[self.i + 1]
            if low in AGG_FUNCS and nxt.kind == "op" and nxt.text == "(":
                self.next()          # func name
                self.next()          # "("
                distinct = False
                if self.eat_kw("distinct"):
                    if low != "count":
                        raise SqlError(
                            f"DISTINCT inside an aggregate is only "
                            f"supported for COUNT, not {low.upper()}"
                        )
                    distinct = True
                if self.eat_op("*"):
                    if low != "count":
                        raise SqlError(f"{low}(*) is only valid for COUNT")
                    if distinct:
                        raise SqlError("COUNT(DISTINCT *) is not valid SQL")
                    arg = Star()
                else:
                    arg = self.parse_expr()
                self.expect_op(")")
                agg = Agg(low, arg, distinct)
                if self.eat_kw("over"):         # windowed aggregate
                    if distinct:
                        raise SqlError(
                            "DISTINCT is not supported in window functions"
                        )
                    if low in VAR_AGG_FUNCS:
                        raise SqlError(
                            f"{low.upper()} is not supported as a window "
                            f"function"
                        )
                    part, order, frame = self.parse_over()
                    return WindowFn(low, arg, part, order, frame=frame)
                return agg
            if low == "quantile" and nxt.kind == "op" and nxt.text == "(":
                # QUANTILE(x, q) — PERCENTILE_CONT with linear
                # interpolation (DuckDB-style call form); MEDIAN(x) is
                # QUANTILE(x, 0.5). The q rides in the Agg func name.
                self.next()          # func name
                self.next()          # "("
                arg = self.parse_expr()
                self.expect_op(",")
                t2 = self.peek()
                if t2.kind != "num":
                    raise SqlError(
                        f"QUANTILE expects a numeric fraction, got "
                        f"{t2.text!r}"
                    )
                qv = float(self.next().text)
                if not 0.0 <= qv <= 1.0:
                    raise SqlError("QUANTILE fraction must be in [0, 1]")
                self.expect_op(")")
                if self.at_kw("over"):
                    raise SqlError(
                        "QUANTILE is not supported as a window function"
                    )
                return Agg(f"quantile@{qv}", arg)
            if low == "ntile" and nxt.kind == "op" and nxt.text == "(":
                self.next()          # func name
                self.next()          # "("
                t2 = self.peek()
                if t2.kind != "num" or "." in t2.text or int(t2.text) < 1:
                    raise SqlError(
                        f"NTILE expects a positive integer bucket count, "
                        f"got {t2.text!r}"
                    )
                nb = int(self.next().text)
                self.expect_op(")")
                self.expect_kw("over")
                part, order, frame = self.parse_over()
                if frame is not None:
                    raise SqlError("ntile does not accept a frame clause")
                return WindowFn("ntile", None, part, order, (nb,))
            if low in WINDOW_ONLY_FUNCS and nxt.kind == "op" and nxt.text == "(":
                self.next()          # func name
                self.next()          # "("
                self.expect_op(")")
                self.expect_kw("over")
                part, order, frame = self.parse_over()
                if frame is not None:
                    raise SqlError(
                        f"{low} does not accept a frame clause"
                    )
                return WindowFn(low, None, part, order)
            if low in WINDOW_ARG_FUNCS and nxt.kind == "op" and nxt.text == "(":
                self.next()          # func name
                self.next()          # "("
                arg = self.parse_expr()
                params = []
                while self.eat_op(","):
                    if low not in ("lag", "lead", "nth_value"):
                        raise SqlError(
                            f"{low} takes exactly one argument"
                        )
                    neg = self.eat_op("-")
                    t2 = self.peek()
                    if t2.kind != "num":
                        raise SqlError(
                            f"{low} offset/default must be a numeric "
                            f"literal, got {t2.text!r}"
                        )
                    v = float(t2.text) if "." in t2.text else int(t2.text)
                    self.next()
                    params.append(-v if neg else v)
                if low == "nth_value":
                    if (len(params) != 1
                            or not isinstance(params[0], int)
                            or params[0] < 1):
                        raise SqlError(
                            "NTH_VALUE expects (expr, positive integer n)"
                        )
                elif len(params) > 2:
                    raise SqlError(f"{low} takes at most 3 arguments")
                self.expect_op(")")
                self.expect_kw("over")
                part, order, frame = self.parse_over()
                if frame is not None:
                    raise SqlError(
                        f"{low} does not accept a frame clause"
                    )
                return WindowFn(low, arg, part, order, tuple(params))
            if low == "coalesce" and nxt.kind == "op" and nxt.text == "(":
                self.next()          # func name
                self.next()          # "("
                args = [self.parse_expr()]
                while self.eat_op(","):
                    args.append(self.parse_expr())
                self.expect_op(")")
                if len(args) < 2:
                    raise SqlError("COALESCE takes at least two arguments")
                from harkdb_tpu.sql.ast_nodes import Coalesce

                return Coalesce(tuple(args))
            if low in SCALAR_FUNCS and nxt.kind == "op" and nxt.text == "(":
                self.next()          # func name
                self.next()          # "("
                arg = self.parse_expr()
                self.expect_op(")")
                return UnOp(low, arg)
            if low in STR_FUNCS and nxt.kind == "op" and nxt.text == "(":
                from harkdb_tpu.sql.ast_nodes import StrFunc

                self.next()          # func name
                self.next()          # "("
                arg = self.parse_expr()
                params = []
                while self.eat_op(","):
                    if low not in ("substr", "substring"):
                        raise SqlError(
                            f"{low} takes exactly one argument"
                        )
                    t2 = self.peek()
                    if t2.kind != "num" or "." in t2.text:
                        raise SqlError(
                            f"{low} start/length must be integer "
                            f"literals, got {t2.text!r}"
                        )
                    params.append(int(self.next().text))
                self.expect_op(")")
                if low in ("substr", "substring"):
                    if not 1 <= len(params) <= 2:
                        raise SqlError(
                            f"{low} expects (string, start [, length])"
                        )
                    if params[0] < 1:
                        raise SqlError(
                            f"{low} start is 1-based and must be >= 1"
                        )
                    low = "substr"
                return StrFunc(low, arg, tuple(params))
            return self.parse_qualified_col()
        raise SqlError(f"Unexpected token {t.text!r} in expression")

    def parse_subquery_stmt(self) -> SelectStmt:
        """Subquery body: one SELECT arm plus its own trailing ORDER BY /
        LIMIT / OFFSET (enables the ``(select v from t order by v desc
        limit 1)`` argmax idiom)."""
        s = self.parse_select_core()
        order_by, limit, offset = self._parse_order_limit_offset()
        if not (order_by or limit is not None or offset is not None):
            return s
        return SelectStmt(
            items=s.items, table=s.table, joins=s.joins, where=s.where,
            group_by=s.group_by, having=s.having, order_by=order_by,
            limit=limit, offset=offset, distinct=s.distinct,
        )

    def parse_over(self):
        """OVER ( [PARTITION BY col, ...] [ORDER BY expr [ASC|DESC], ...]
        [ROWS BETWEEN {UNBOUNDED | k} PRECEDING AND CURRENT ROW] ).

        ``RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`` is also
        accepted (it IS the SQL default frame → ``frame=None``); any other
        RANGE frame or a FOLLOWING bound raises."""
        self.expect_op("(")
        part = []
        if self.eat_kw("partition"):
            self.expect_kw("by")
            part.append(self.parse_qualified_col())
            while self.eat_op(","):
                part.append(self.parse_qualified_col())
        order = []
        if self.at_kw("order", "sort"):
            self.next()
            self.expect_kw("by")
            order.append(self.parse_order_item())
            while self.eat_op(","):
                order.append(self.parse_order_item())
            if any(o.nulls is not None for o in order):
                raise SqlError(
                    "NULLS FIRST/LAST is not supported inside OVER(...)"
                )
        frame = None
        if self.at_kw("rows", "range"):
            is_rows = self.next().text.lower() == "rows"
            self.expect_kw("between")

            def bound(side: str):
                """Signed offset relative to the current row: negative =
                PRECEDING, positive = FOLLOWING, None = unbounded in that
                direction."""
                if self.eat_kw("unbounded"):
                    if side == "lo":
                        self.expect_kw("preceding")
                    else:
                        self.expect_kw("following")
                    return None
                if self.eat_kw("current"):
                    self.expect_kw("row")
                    return 0
                t = self.peek()
                if t.kind != "num" or "." in t.text:
                    raise SqlError(
                        f"Frame bound expects an integer, UNBOUNDED or "
                        f"CURRENT, got {t.text!r}"
                    )
                k = int(self.next().text)
                if self.eat_kw("preceding"):
                    return -k
                self.expect_kw("following")
                return k

            lo = bound("lo")
            self.expect_kw("and")
            hi = bound("hi")
            if is_rows:
                if lo is not None and hi is not None and lo > hi:
                    raise SqlError(
                        "Frame start must not be after frame end"
                    )
                frame = ("rows", lo, hi)
            elif not (lo is None and hi == 0):
                raise SqlError(
                    "Only RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT "
                    "ROW (the default frame) is supported; use ROWS for "
                    "bounded frames"
                )
        self.expect_op(")")
        return tuple(part), tuple(order), frame

    def parse_case(self) -> Case:
        """CASE in both SQL forms: the searched
        ``CASE WHEN cond THEN val ... [ELSE val] END`` and the simple
        ``CASE expr WHEN v THEN val ... [ELSE val] END`` (desugared at
        parse time to equality conditions on the operand)."""
        self.expect_kw("case")
        operand = None
        if not self.at_kw("when"):
            operand = self.parse_expr()
        whens = []
        while self.eat_kw("when"):
            cond = self.parse_expr()
            if operand is not None:
                cond = BinOp("=", operand, cond)
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        if not whens:
            raise SqlError("CASE requires at least one WHEN ... THEN")
        else_ = self.parse_expr() if self.eat_kw("else") else None
        self.expect_kw("end")
        return Case(tuple(whens), else_)


def parse_sql(sql: str, views=None) -> SelectStmt:
    """Parse one [WITH-prefixed] SELECT statement into the typed AST.

    ``WITH name AS (SELECT ...) [, name2 AS (...)] SELECT ...`` desugars at
    parse time: each CTE body becomes the backing statement of a
    ``DerivedRef`` wherever its name appears (plan/derived.py shares one
    materialization per CTE body). Later CTE bodies may reference earlier
    ones (pre-substituted in definition order).

    ``views``: registered view name → SQL text (``Context.create_view``).
    Views substitute exactly like CTEs (a view is a persistent CTE);
    view bodies may reference other views. CTEs shadow views of the same
    name for the statement they prefix."""
    from harkdb_tpu.sql.ast_nodes import substitute_ctes

    cte_map = {}
    if views:
        resolved: dict = {}
        for name, body_sql in views.items():
            body = Parser(tokenize(body_sql)).parse_select()
            resolved[name] = substitute_ctes(
                body, {k: v for k, v in resolved.items()}
            )
        cte_map.update(resolved)
    p = Parser(tokenize(sql))
    declared = set()
    if p.eat_kw("with"):
        while True:
            name = p.expect_ident()
            if name in declared:
                raise SqlError(f"Duplicate CTE name {name!r}")
            declared.add(name)
            p.expect_kw("as")
            p.expect_op("(")
            body = p.parse_compound_select()
            p.expect_op(")")
            # earlier CTEs (and views — a CTE shadows a same-named view)
            # resolve inside later bodies
            cte_map[name] = substitute_ctes(body, cte_map)
            if not p.eat_op(","):
                break
    stmt = p.parse_select()
    if p.peek().kind != "eof":
        raise SqlError(
            f"Unexpected trailing input at {p.peek().text!r}"
        )
    if cte_map:
        stmt = substitute_ctes(stmt, cte_map)
    return stmt
