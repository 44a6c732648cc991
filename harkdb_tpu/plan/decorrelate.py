"""Correlated aggregate subquery decorrelation (round-5 verdict item 6).

``WHERE x <op> (SELECT agg(e) FROM r WHERE r.k = t.k [AND rest])`` — the
classic correlated scalar aggregate — rewrites into a LEFT JOIN against
the aggregate grouped by the correlation key:

    ... LEFT JOIN (SELECT k AS ck, agg(e) AS cv
                   FROM r WHERE rest GROUP BY k) #corrN
        ON t.k = #corrN.ck
    ... x <op> #corrN.cv

Both building blocks shipped in round 4 (derived tables; LEFT-JOIN NULL
flags), and round 5's three-valued logic makes the semantics EXACT: an
outer row with no matching inner rows sees ``cv`` as NULL, so the
comparison is UNKNOWN and rejects the row — precisely SQL's behavior for
an empty correlated aggregate (which yields NULL). COUNT is the one
exception (empty → 0, not NULL): its substitution wraps in
``COALESCE(cv, 0)``.

The grouped derived table has one row per key, so the LEFT JOIN preserves
row multiplicity — the rewrite is valid in the select list and ORDER BY
too, not just WHERE. Richer correlation (non-equality, multi-level,
inside HAVING) still raises the named error in ``planner``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from harkdb_tpu.sql.ast_nodes import (
    Agg, BinOp, Case, Coalesce, Col, DerivedRef, ExistsSub, InSub,
    JoinClause, Lit, LutMember, OrderItem, SelectItem, SelectStmt, Star,
    SubQuery, UnOp, WindowFn, walk,
)


def _binding_columns(refs, tables) -> Dict[str, set]:
    """binding → column-name set for a FROM/JOIN ref list (DerivedRef
    schemas come from their select-item aliases, like _rewrite_exists)."""
    out: Dict[str, set] = {}
    for ref in refs:
        if isinstance(ref, DerivedRef):
            body = ref.stmt
            if not isinstance(body, SelectStmt):
                body = body.arms[0]      # set-op body: first arm's schema
            out[ref.binding] = {
                it.alias or (it.expr.name if isinstance(it.expr, Col)
                             else "")
                for it in body.items
            }
        elif ref.name in tables:
            out[ref.binding] = set(tables[ref.name].get_schema())
        else:
            out[ref.binding] = set()     # planner reports the real error
    return out


def _conjuncts(e) -> List:
    if isinstance(e, BinOp) and e.op == "and":
        return _conjuncts(e.left) + _conjuncts(e.right)
    return [e]


def decorrelate_aggregates(stmt: SelectStmt, tables) -> SelectStmt:
    """Rewrite decorrelatable scalar-aggregate subqueries in the select
    list, WHERE and ORDER BY. Returns the (possibly) transformed statement;
    unrecognized correlation shapes are left untouched for the planner's
    named error."""
    outer_bind = _binding_columns(
        [stmt.table] + [j.table for j in stmt.joins], tables
    )
    new_joins: List[JoinClause] = []
    counter = [0]
    memo: Dict[SubQuery, Optional[object]] = {}

    def try_rewrite(sub: SubQuery) -> Optional[object]:
        # identical subqueries (value equality — frozen AST dataclasses)
        # share ONE grouped derived table + LEFT JOIN instead of
        # duplicating the aggregation per occurrence
        if sub in memo:
            return memo[sub]
        memo[sub] = r = _try_rewrite(sub)
        return r

    def _try_rewrite(sub: SubQuery) -> Optional[object]:
        s = sub.stmt
        if not isinstance(s, SelectStmt):
            return None              # set-operation body — scalar path
        if (s.group_by or s.having is not None or s.distinct
                or s.limit is not None or s.offset):
            return None
        if len(s.items) != 1:
            return None
        agg = s.items[0].expr
        if not isinstance(agg, Agg):
            return None
        inner_bind = _binding_columns(
            [s.table] + [j.table for j in s.joins], tables
        )

        def scope(col: Col) -> str:
            if col.table is not None:
                if col.table in inner_bind:
                    return "inner"
                if col.table in outer_bind:
                    return "outer"
                return "unknown"
            if any(col.name in cs for cs in inner_bind.values()):
                return "inner"      # inner shadows outer (standard SQL)
            if any(col.name in cs for cs in outer_bind.values()):
                return "outer"
            return "unknown"

        corr: Optional[Tuple[Col, Col]] = None
        rest = []
        for c in (_conjuncts(s.where) if s.where is not None else []):
            if (corr is None and isinstance(c, BinOp) and c.op == "="
                    and isinstance(c.left, Col)
                    and isinstance(c.right, Col)):
                sl, sr = scope(c.left), scope(c.right)
                if {sl, sr} == {"inner", "outer"}:
                    inner_col = c.left if sl == "inner" else c.right
                    outer_col = c.right if sl == "inner" else c.left
                    corr = (inner_col, outer_col)
                    continue
            if any(isinstance(nd, Col) and scope(nd) == "outer"
                   for nd in walk(c)):
                return None          # extra correlation — not this shape
            rest.append(c)
        if corr is None:
            return None              # uncorrelated — scalar path handles it
        # the aggregate body itself must not reference the outer scope
        if any(isinstance(nd, Col) and scope(nd) == "outer"
               for nd in walk(agg)):
            return None
        inner_col, outer_col = corr
        w = None
        for c in rest:
            w = c if w is None else BinOp("and", w, c)
        alias = f"#corr{counter[0]}"
        counter[0] += 1
        body = SelectStmt(
            items=(SelectItem(inner_col, "ck"), SelectItem(agg, "cv")),
            table=s.table, joins=s.joins, where=w,
            group_by=(inner_col,), having=None, order_by=(), limit=None,
            offset=None, distinct=False,
        )
        new_joins.append(JoinClause(
            DerivedRef(body, alias),
            conds=((outer_col, Col("ck", table=alias)),),
            kind="left",
        ))
        cv = Col("cv", table=alias)
        if agg.func == "count":
            # SQL: COUNT over no matching rows is 0, not NULL
            return Coalesce((cv, Lit(0)))
        return cv

    def ex(e):
        if isinstance(e, SubQuery):
            r = try_rewrite(e)
            return r if r is not None else e
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
        if isinstance(e, LutMember):
            return LutMember(ex(e.col), e.lut)
        if isinstance(e, InSub):
            return InSub(ex(e.expr), e.sub, e.negate)
        if isinstance(e, ExistsSub):
            return e                 # EXISTS has its own lowering
        from harkdb_tpu.sql.ast_nodes import StrFunc

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

    items = tuple(
        it if isinstance(it.expr, Star)
        else SelectItem(ex(it.expr), it.alias)
        for it in stmt.items
    )
    where = ex(stmt.where) if stmt.where is not None else None
    order_by = tuple(
        OrderItem(ex(o.expr), o.descending, o.nulls) for o in stmt.order_by
    )
    if not new_joins:
        return stmt
    return SelectStmt(
        items=items, table=stmt.table,
        joins=tuple(stmt.joins) + tuple(new_joins), where=where,
        group_by=stmt.group_by, having=stmt.having, order_by=order_by,
        limit=stmt.limit, offset=stmt.offset, distinct=stmt.distinct,
    )
