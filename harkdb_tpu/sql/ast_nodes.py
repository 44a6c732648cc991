"""SQL AST.

The reference has no AST of its own — it leans on ``moz_sql_parser``'s JSON
trees and immediately flattens them to an index dict (``parse.py:16-91``).
Here a small typed AST is the planner's input, covering the full advertised
grammar (reference ``README.md:8-15``): SELECT / FROM / WHERE / GROUP BY /
HAVING / SORT BY (ORDER BY) / JOIN, plus arithmetic & boolean expressions and
the aggregate set {sum, prod, max, min} (``parse.py:81``) extended with
count/avg.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union


@dataclass(frozen=True)
class Lit:
    value: Union[int, float, str]    # str literals ('...') lower to dictionary
                                     # codes at plan time and never reach the
                                     # device (see planner string lowering)


@dataclass(frozen=True)
class Col:
    name: str
    table: Optional[str] = None      # qualifier: "t.col"

    def display(self) -> str:
        return f"{self.table}.{self.name}" if self.table else self.name


@dataclass(frozen=True)
class Star:
    table: Optional[str] = None      # "t.*"


@dataclass(frozen=True)
class BinOp:
    op: str                          # + - * / % = != < <= > >= and or
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class UnOp:
    op: str                          # "not", "-"
    operand: "Expr"


@dataclass(frozen=True)
class Agg:
    func: str                        # sum prod max min count avg
    arg: Union["Expr", Star]
    distinct: bool = False           # COUNT(DISTINCT x)


@dataclass(frozen=True)
class Case:
    """CASE WHEN c1 THEN r1 [WHEN c2 THEN r2 ...] [ELSE e] END.

    The searched form only (the reference grammar has no CASE at all;
    standard-SQL semantics: first true condition wins, missing ELSE yields 0
    — the engine's numeric model has no NULL)."""
    whens: Tuple[Tuple["Expr", "Expr"], ...]
    else_: Optional["Expr"] = None


@dataclass(frozen=True)
class WindowFn:
    """``func([arg]) OVER ([PARTITION BY cols] [ORDER BY exprs])``.

    Funcs: row_number / rank / dense_rank (no argument), the aggregates
    sum/count/min/max/avg/prod, and the positional functions
    lag/lead (``params`` = (offset, default), ROWS-based per the standard)
    and first_value/last_value. Default frame semantics (``frame=None``):
    with ORDER BY, RANGE UNBOUNDED PRECEDING..CURRENT ROW (running
    aggregate, peers included); without, the whole partition. An explicit
    ``ROWS BETWEEN {UNBOUNDED | k} PRECEDING AND CURRENT ROW`` sets
    ``frame=("rows", None | k)`` — positional, peers excluded."""
    func: str
    arg: object                          # Expr | Star | None
    partition_by: Tuple[Col, ...] = ()
    order_by: Tuple["OrderItem", ...] = ()
    params: Tuple = ()                   # lag/lead: (offset, default)
    frame: Optional[Tuple] = None        # ("rows", None | k) | None


@dataclass(frozen=True)
class SubQuery:
    """A parenthesized scalar subquery ``(SELECT ...)`` — one output column,
    one row, non-correlated (inner names resolve only against the table
    registry). Evaluated once at first execution and substituted as a
    literal (tables are immutable while a plan is cached)."""
    stmt: "SelectStmt"


@dataclass(frozen=True)
class Coalesce:
    """``COALESCE(a, b, ...)`` — first non-NULL argument. In this engine
    only LEFT-JOIN unmatched rows are NULL, so the planner lowers it to a
    CASE guarded by the matched flags of each argument (``_lower_isnull``);
    an argument with no nullable references short-circuits the rest."""
    args: tuple


@dataclass(frozen=True)
class ExistsSub:
    """``EXISTS (SELECT ...)`` — a boolean predicate. The planner lowers a
    single correlated column equality (``... WHERE r.k = t.k``) to the
    semi-join form ``t.k IN (SELECT r.k ...)``; an uncorrelated EXISTS
    becomes ``(SELECT count(*) ...) > 0``. ``NOT EXISTS`` arrives as
    ``UnOp("not", ExistsSub(...))``."""
    stmt: "SelectStmt"


@dataclass(frozen=True)
class InSub:
    """``expr [NOT] IN (SELECT ...)`` — one output column, non-correlated.
    Lowered at first execution to an OR-chain of equality comparisons over
    the subquery's distinct values (≤1024), or a boolean-LUT membership
    gather for larger sets (ints within a bounded span; string codes)."""
    expr: "Expr"
    sub: SubQuery
    negate: bool = False


@dataclass(frozen=True)
class NullTag:
    """Planner-internal wrapper overriding nullability analysis: the
    VALUE is ``expr``; the expression is NULL iff any flag in ``flags``
    is 0 — where a flag may be a *derived* flag name resolved through
    ``plan.derived_flag_cols`` (an OR over matched conditions, needed for
    COALESCE over several independently-nullable arguments: NULL iff ALL
    of them are, which a plain AND-of-flags list cannot express).
    Created by ``plan/nulls.py``'s COALESCE lowering; never parsed."""
    expr: "Expr"
    flags: Tuple[str, ...]


@dataclass(frozen=True)
class StrFunc:
    """String scalar function ``UPPER/LOWER/TRIM/SUBSTR/LENGTH`` (engine
    extension; the reference is numeric-only). Parse-time node only: the
    planner's string lowering turns it into a :class:`CodeMap` — a
    plan-time dictionary transform, so the device never sees a string.
    ``params``: SUBSTR's (start, [length]) integer literals."""
    func: str
    arg: "Expr"
    params: Tuple = ()


class CodeMap:
    """Plan-time value map over a dictionary-encoded column:
    ``lut[codes]``. For string→string functions (UPPER/SUBSTR/...),
    ``out_dict`` is the new sorted unique dictionary and ``lut`` maps old
    codes to new ones (chained functions compose into ONE gather); for
    LENGTH, ``out_dict`` is None and ``lut`` holds the integer results.
    Planner-generated only (never produced by the parser).

    Not a dataclass: ndarray payloads need value-based equality (two
    lowerings of the same expression must compare equal for the GROUP BY
    expression-substitution to recognize them)."""

    __slots__ = ("col", "lut", "out_dict")

    def __init__(self, col, lut, out_dict=None):
        object.__setattr__(self, "col", col)
        object.__setattr__(self, "lut", lut)
        object.__setattr__(self, "out_dict", out_dict)

    def __setattr__(self, *_a):
        raise AttributeError("CodeMap is immutable")

    def __eq__(self, other):
        import numpy as np

        if not isinstance(other, CodeMap):
            return NotImplemented
        if self.col != other.col:
            return False
        if not np.array_equal(self.lut, other.lut):
            return False
        a, b = self.out_dict, other.out_dict
        if (a is None) != (b is None):
            return False
        return a is None or np.array_equal(a, b)

    def __hash__(self):
        return hash((CodeMap, self.col))

    def __repr__(self):
        return f"CodeMap({self.col!r}, lut[{len(self.lut)}])"


@dataclass(frozen=True, eq=False)
class LutMember:
    """Boolean membership test ``lut[col]`` over a small plan-time lookup
    table indexed by dictionary code (planner-generated for LIKE patterns
    whose matching codes are too scattered for a range OR-chain; never
    produced by the parser). ``eq=False``: ndarray payload — identity
    equality is sufficient (never deduplicated)."""
    col: "Expr"
    lut: object                      # np.ndarray[bool], len == dictionary size


Expr = Union[Lit, Col, BinOp, UnOp, Agg, Case, LutMember, SubQuery, InSub,
             WindowFn]


@dataclass(frozen=True)
class SelectItem:
    expr: Union[Expr, Star]
    alias: Optional[str] = None


@dataclass(frozen=True)
class TableRef:
    name: str
    alias: Optional[str] = None

    @property
    def binding(self) -> str:
        return self.alias or self.name


@dataclass(frozen=True)
class DerivedRef:
    """``FROM (SELECT ...) alias`` — a derived table. The alias is
    mandatory (there is no base name to fall back to)."""
    stmt: "SelectStmt"
    alias: str

    @property
    def name(self) -> str:
        return f"#derived:{self.alias}"

    @property
    def binding(self) -> str:
        return self.alias


@dataclass(frozen=True)
class JoinClause:
    """One JOIN step. ``conds`` is a conjunction of column equalities
    (``ON a.x = b.x AND a.y = b.y`` — multi-key equi-join; the reference
    kernel is single-key, ``join.fut:52-75``). Empty ``conds`` = CROSS
    JOIN. ``residuals`` are non-equi AND-terms of the ON condition —
    INNER joins lower them into WHERE (equivalent), outer joins reject
    them. ``kind``: inner | left | right | full | cross."""
    table: TableRef
    conds: Tuple[Tuple[Col, Col], ...]
    kind: str = "inner"
    residuals: Tuple = ()


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    descending: bool = False
    #: None = SQL default (NULLS LAST for ASC, FIRST for DESC);
    #: "first"/"last" = explicit. Only meaningful for expressions over
    #: nullable (LEFT-JOIN right side) columns; ignored elsewhere.
    nulls: object = None


@dataclass(frozen=True)
class SelectStmt:
    items: Tuple[SelectItem, ...]
    table: TableRef
    joins: Tuple[JoinClause, ...] = ()
    where: Optional[Expr] = None
    group_by: Tuple[Col, ...] = ()
    having: Optional[Expr] = None
    order_by: Tuple[OrderItem, ...] = ()
    limit: Optional[int] = None
    offset: Optional[int] = None
    distinct: bool = False


@dataclass(frozen=True)
class UnionStmt:
    """``arm1 <setop> arm2 [<setop> arm3 ...] [ORDER BY ...] [LIMIT n]
    [OFFSET m]`` where ``<setop>`` is UNION [ALL] / INTERSECT / EXCEPT.

    Arms are plain SelectStmts without ORDER BY/LIMIT/OFFSET (standard SQL:
    those trail the whole statement and apply to the combined result).
    ``ops[i]`` names the junction between the accumulated result and
    ``arms[i + 1]``: "union all" | "union" | "intersect" | "except".
    Evaluation is left-associative with equal precedence (SQLite's rule;
    the standard's INTERSECT-binds-tighter is NOT applied — parenthesize
    via derived tables when it matters). NULLs compare EQUAL in every
    distinct set operation."""
    arms: Tuple[SelectStmt, ...]
    ops: Tuple[str, ...]                 # len == len(arms) - 1
    order_by: Tuple[OrderItem, ...] = ()
    limit: Optional[int] = None
    offset: Optional[int] = None


def substitute_ctes(stmt, cte_map):
    """Desugar ``WITH`` by rewriting every ``TableRef`` whose name is a CTE
    into a ``DerivedRef`` over that CTE's body (the derived-table path —
    ``plan/derived.py``). The SAME ``SelectStmt`` object backs every
    reference to one CTE, so the planner shares a single materialization
    per CTE body (keyed by statement identity). Recurses into derived
    tables, scalar/IN/EXISTS subqueries and UNION arms; inner derived
    tables or CTE bodies referencing other CTEs resolve against the same
    map (the parser pre-substitutes earlier CTEs into later bodies)."""
    if isinstance(stmt, UnionStmt):
        return UnionStmt(
            arms=tuple(substitute_ctes(a, cte_map) for a in stmt.arms),
            ops=stmt.ops, order_by=stmt.order_by, limit=stmt.limit,
            offset=stmt.offset,
        )

    def ref(r):
        if isinstance(r, DerivedRef):
            return DerivedRef(substitute_ctes(r.stmt, cte_map), r.alias)
        if r.name in cte_map:
            return DerivedRef(cte_map[r.name], r.binding)
        return r

    def ex(e):
        if isinstance(e, SubQuery):
            return SubQuery(substitute_ctes(e.stmt, cte_map))
        if isinstance(e, ExistsSub):
            return ExistsSub(substitute_ctes(e.stmt, cte_map))
        if isinstance(e, InSub):
            return InSub(ex(e.expr),
                         SubQuery(substitute_ctes(e.sub.stmt, cte_map)),
                         e.negate)
        if isinstance(e, BinOp):
            return BinOp(e.op, ex(e.left), ex(e.right))
        if isinstance(e, UnOp):
            return UnOp(e.op, ex(e.operand))
        if isinstance(e, Agg) and not isinstance(e.arg, Star):
            return Agg(e.func, ex(e.arg), e.distinct)
        if isinstance(e, Case):
            return Case(tuple((ex(c), ex(r)) for c, r in e.whens),
                        ex(e.else_) if e.else_ is not None else None)
        if isinstance(e, Coalesce):
            return Coalesce(tuple(ex(a) for a in e.args))
        if isinstance(e, StrFunc):
            return StrFunc(e.func, ex(e.arg), e.params)
        if isinstance(e, WindowFn):
            arg = e.arg
            if arg is not None and not isinstance(arg, Star):
                arg = ex(arg)
            return WindowFn(
                e.func, arg, e.partition_by,
                tuple(OrderItem(ex(o.expr), o.descending, o.nulls)
                      for o in e.order_by),
                e.params, e.frame,
            )
        return e

    return SelectStmt(
        items=tuple(
            it if isinstance(it.expr, Star)
            else SelectItem(ex(it.expr), it.alias)
            for it in stmt.items
        ),
        table=ref(stmt.table),
        joins=tuple(JoinClause(ref(j.table), j.conds, j.kind,
                               tuple(ex(r) for r in j.residuals))
                    for j in stmt.joins),
        where=ex(stmt.where) if stmt.where is not None else None,
        group_by=stmt.group_by,
        having=ex(stmt.having) if stmt.having is not None else None,
        order_by=tuple(OrderItem(ex(o.expr), o.descending, o.nulls)
                       for o in stmt.order_by),
        limit=stmt.limit, offset=stmt.offset, distinct=stmt.distinct,
    )


def walk(expr) -> list:
    """All nodes of an expression tree, preorder."""
    out = [expr]
    if isinstance(expr, BinOp):
        out += walk(expr.left) + walk(expr.right)
    elif isinstance(expr, UnOp):
        out += walk(expr.operand)
    elif isinstance(expr, Agg) and not isinstance(expr.arg, Star):
        out += walk(expr.arg)
    elif isinstance(expr, Case):
        for c, r in expr.whens:
            out += walk(c) + walk(r)
        if expr.else_ is not None:
            out += walk(expr.else_)
    elif isinstance(expr, LutMember):
        out += walk(expr.col)
    elif isinstance(expr, CodeMap):
        out += walk(expr.col)
    elif isinstance(expr, StrFunc):
        out += walk(expr.arg)
    elif isinstance(expr, NullTag):
        out += walk(expr.expr)
    elif isinstance(expr, InSub):
        out += walk(expr.expr)       # the subquery body is self-contained —
                                     # its names resolve against its own plan
    elif isinstance(expr, WindowFn):
        if expr.arg is not None and not isinstance(expr.arg, Star):
            out += walk(expr.arg)
        for p in expr.partition_by:
            out += walk(p)
        for o in expr.order_by:
            out += walk(o.expr)
    elif isinstance(expr, Coalesce):
        for a in expr.args:
            out += walk(a)
    return out
