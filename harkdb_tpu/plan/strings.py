"""String-column lowering (engine extension; the reference is numeric-only,
``README.md:8``).

Strings are dictionary-encoded at ingest (``columnar/ingest.py``): the device
holds int32 codes assigned in lexicographic order, the host holds the sorted
dictionary. All string semantics lower to integer operations at PLAN time:
literal comparisons become code comparisons (binary search in the
dictionary), LIKE becomes a code-range OR-chain or a boolean LUT gather, and
cross-dictionary joins/comparisons merge dictionaries host-side with
per-column code-remap LUTs applied at load.

``StringLowering`` is a mixin over ``QueryPlan`` (which owns ``str_dicts``
and ``_remap``) — split out of ``plan/planner.py`` in round 4 purely for
maintainability; behavior is unchanged.
"""

from __future__ import annotations

import re

import numpy as np

from harkdb_tpu.plan.errors import PlanError
from harkdb_tpu.sql.ast_nodes import (
    Agg, BinOp, Case, Coalesce, CodeMap, Col, InSub, Lit, LutMember, Star,
    StrFunc, SubQuery, UnOp, WindowFn,
)


class StringLowering:
    # -- string dictionary machinery ------------------------------------------
    # Strings are dictionary-encoded at ingest (columnar/ingest.py): the
    # device holds int32 codes assigned in lexicographic order, the host
    # holds the sorted dictionary. All string semantics lower to integer
    # operations at PLAN time: literal comparisons become code comparisons
    # (binary search in the dictionary), LIKE becomes a code-range OR-chain
    # or a boolean LUT gather, and cross-dictionary joins/comparisons merge
    # dictionaries host-side with per-column code-remap LUTs applied at load.

    _CMP_OPS = ("=", "!=", "<", "<=", ">", ">=")
    _MIRROR = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
               "=": "=", "!=": "!="}

    def _str_internal(self, e):
        """Representative string-typed column internal of an expression
        (through MIN/MAX, which preserve dictionary codes), else None."""
        if isinstance(e, Col) and e.name in self.str_dicts:
            return e.name
        if (isinstance(e, Agg) and e.func in ("min", "max")
                and not isinstance(e.arg, Star)):
            return self._str_internal(e.arg)
        return None

    def _expr_str_dict(self, e):
        if isinstance(e, CodeMap):
            return e.out_dict
        internal = self._str_internal(e)
        return None if internal is None else self.str_dicts[internal]

    def _is_string_typed(self, e) -> bool:
        if isinstance(e, Lit) and isinstance(e.value, str):
            return True
        return self._expr_str_dict(e) is not None

    def _compose_remap(self, internal: str, step_lut: np.ndarray):
        prev = self._remap.get(internal)
        self._remap[internal] = (
            step_lut if prev is None else step_lut[prev]
        )

    def _merge_dicts(self, a_internal: str, b_internal: str):
        """Unify the dictionaries of two string columns: every column whose
        current dictionary matches either side gets a composed remap LUT into
        the union dictionary (codes stay lexicographic ranks)."""
        da = self.str_dicts[a_internal]
        db = self.str_dicts[b_internal]
        if np.array_equal(da, db):
            for k, d in self.str_dicts.items():
                if d is db:
                    self.str_dicts[k] = da
            return
        merged = np.union1d(da, db)
        map_a = np.searchsorted(merged, da).astype(np.int32)
        map_b = np.searchsorted(merged, db).astype(np.int32)
        for k, d in list(self.str_dicts.items()):
            if d is da or np.array_equal(d, da):
                self._compose_remap(k, map_a)
                self.str_dicts[k] = merged
            elif d is db or np.array_equal(d, db):
                self._compose_remap(k, map_b)
                self.str_dicts[k] = merged

    def _collect_merges(self, e):
        """Pass 1: find string col-vs-col comparisons across different
        dictionaries and merge, so pass 2 translates literals against final
        dictionaries."""
        if isinstance(e, BinOp):
            if e.op in self._CMP_OPS:
                a = self._str_internal(e.left)
                b = self._str_internal(e.right)
                if (a is not None and b is not None
                        and not np.array_equal(self.str_dicts[a],
                                               self.str_dicts[b])):
                    self._merge_dicts(a, b)
            self._collect_merges(e.left)
            self._collect_merges(e.right)
        elif isinstance(e, UnOp):
            self._collect_merges(e.operand)
        elif isinstance(e, Agg) and not isinstance(e.arg, Star):
            self._collect_merges(e.arg)
        elif isinstance(e, Case):
            for c, r in e.whens:
                self._collect_merges(c)
                self._collect_merges(r)
            if e.else_ is not None:
                self._collect_merges(e.else_)
        elif isinstance(e, WindowFn):
            if e.arg is not None and not isinstance(e.arg, Star):
                self._collect_merges(e.arg)
            for o in e.order_by:
                self._collect_merges(o.expr)
        elif isinstance(e, Coalesce):
            for a in e.args:
                self._collect_merges(a)
        elif isinstance(e, StrFunc):
            self._collect_merges(e.arg)

    def _lower_str_cmp(self, op: str, col_expr, d: np.ndarray, v: str):
        """col <op> 'literal' → integer code comparison. Codes are
        lexicographic ranks, so range ops are one binary search; equality
        against an absent value folds to constant false (codes are ≥ 0)."""
        if op in ("=", "!="):
            i = int(np.searchsorted(d, v))
            present = i < len(d) and d[i] == v
            if op == "=":
                return (BinOp("=", col_expr, Lit(i)) if present
                        else BinOp("<", col_expr, Lit(0)))      # always false
            return (BinOp("!=", col_expr, Lit(i)) if present
                    else BinOp(">=", col_expr, Lit(0)))          # always true
        side = {"<": "left", "<=": "right", ">": "right", ">=": "left"}[op]
        i = int(np.searchsorted(d, v, side=side))
        out_op = "<" if op in ("<", "<=") else ">="
        return BinOp(out_op, col_expr, Lit(i))

    def _lower_like(self, col_expr, d: np.ndarray, pattern: str,
                    ci: bool = False):
        """LIKE against the dictionary, host-side: % → .*, _ → . (fullmatch;
        ``ci`` = ILIKE, case-insensitive). Contiguous matching-code runs
        lower to a fused compare OR-chain; a scattered match set lowers to
        one boolean-LUT gather (LutMember)."""
        rx = re.compile(
            "".join(".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
                    for ch in pattern),
            re.DOTALL | (re.IGNORECASE if ci else 0),
        )
        m = np.array([rx.fullmatch(s) is not None for s in d.tolist()],
                     dtype=bool)
        if not m.any():
            return BinOp("<", col_expr, Lit(0))                  # always false
        if m.all():
            return BinOp(">=", col_expr, Lit(0))                 # always true
        idx = np.flatnonzero(m)
        runs = np.split(idx, np.flatnonzero(np.diff(idx) > 1) + 1)
        if len(runs) <= 32:
            out = None
            for r in runs:
                a, b = int(r[0]), int(r[-1])
                t = (BinOp("=", col_expr, Lit(a)) if a == b
                     else BinOp("and", BinOp(">=", col_expr, Lit(a)),
                                BinOp("<=", col_expr, Lit(b))))
                out = t if out is None else BinOp("or", out, t)
            return out
        return LutMember(col_expr, m)

    def _lower_str_func(self, e: StrFunc):
        """String scalar function → :class:`CodeMap` dictionary transform.

        The function applies to the DICTIONARY host-side (a few thousand
        entries), never to row data: the result is a composed old-code →
        new-code LUT plus the new sorted unique dictionary (so downstream
        comparisons / ORDER BY / GROUP BY / MIN / MAX keep operating on
        lexicographic ranks), or an integer LUT for LENGTH. Chained
        functions (``upper(substr(s, 1, 2))``) compose into ONE gather."""
        arg = self._lower_strings(e.arg)
        d = self._expr_str_dict(arg)
        if e.func == "length":
            if d is None:
                raise PlanError("LENGTH requires a string argument")
        elif d is None:
            raise PlanError(
                f"{e.func.upper()} requires a string argument"
            )
        if isinstance(arg, CodeMap):
            base, lut0 = arg.col, arg.lut
        else:
            base, lut0 = arg, None

        def compose(lut):
            return lut if lut0 is None else lut[lut0]

        if e.func == "length":
            lens = np.char.str_len(d.astype(str)).astype(np.int32)
            return CodeMap(base, compose(lens), None)
        sd = d.astype(str)
        if e.func == "upper":
            vals = np.char.upper(sd)
        elif e.func == "lower":
            vals = np.char.lower(sd)
        elif e.func == "trim":
            vals = np.char.strip(sd)
        else:                                       # substr
            start = e.params[0] - 1                 # SQL is 1-based
            if len(e.params) > 1:
                stop = start + e.params[1]
                vals = np.array([s[start:stop] for s in sd.tolist()])
            else:
                vals = np.array([s[start:] for s in sd.tolist()])
        uniq, inverse = np.unique(vals, return_inverse=True)
        return CodeMap(base, compose(inverse.astype(np.int32)), uniq)

    def _lower_strings(self, e):
        """Pass 2: translate string comparisons/LIKE to code operations and
        validate typing (no string arithmetic, no SUM/PROD/AVG on strings,
        no string-valued CASE)."""
        if isinstance(e, (Lit, Col)):
            return e
        if isinstance(e, StrFunc):
            return self._lower_str_func(e)
        if isinstance(e, CodeMap):
            return e                      # already lowered (idempotent pass)
        from harkdb_tpu.sql.ast_nodes import NullTag

        if isinstance(e, NullTag):
            return NullTag(self._lower_strings(e.expr), e.flags)
        if isinstance(e, UnOp):
            v = self._lower_strings(e.operand)
            if (e.op in ("-", "abs", "floor", "ceil", "round", "sqrt",
                         "cast_int", "cast_float")
                    and self._is_string_typed(v)):
                raise PlanError(f"Cannot apply {e.op} to a string column")
            return UnOp(e.op, v)
        if isinstance(e, Agg):
            if isinstance(e.arg, Star):
                return e
            arg = self._lower_strings(e.arg)
            if (e.func in ("sum", "prod", "avg", "stddev", "variance",
                           "stddev_samp", "var_samp", "stddev_pop",
                           "var_pop")
                    and self._is_string_typed(arg)):
                raise PlanError(
                    f"{e.func.upper()} over a string column is not supported"
                )
            return Agg(e.func, arg, e.distinct)
        if isinstance(e, WindowFn):
            from harkdb_tpu.sql.ast_nodes import OrderItem

            arg = e.arg
            if arg is not None and not isinstance(arg, Star):
                arg = self._lower_strings(arg)
                if (e.func in ("sum", "prod", "avg")
                        and self._is_string_typed(arg)):
                    raise PlanError(
                        f"{e.func.upper()} over a string column is not "
                        f"supported"
                    )
            return WindowFn(
                e.func, arg, e.partition_by,
                tuple(OrderItem(self._lower_strings(o.expr), o.descending)
                      for o in e.order_by),
                e.params, e.frame,
            )
        if isinstance(e, Coalesce):
            args = tuple(self._lower_strings(a) for a in e.args)
            for a in args:
                if self._is_string_typed(a):
                    raise PlanError(
                        "COALESCE over string columns is not supported"
                    )
            return Coalesce(args)
        if isinstance(e, Case):
            whens = tuple(
                (self._lower_strings(c), self._lower_strings(r))
                for c, r in e.whens
            )
            else_ = (self._lower_strings(e.else_)
                     if e.else_ is not None else None)
            for _c, r in whens:
                if self._is_string_typed(r):
                    raise PlanError("CASE cannot produce string values")
            if else_ is not None and self._is_string_typed(else_):
                raise PlanError("CASE cannot produce string values")
            return Case(whens, else_)
        if isinstance(e, BinOp):
            if e.op in ("like", "ilike"):
                left = self._lower_strings(e.left)
                d = self._expr_str_dict(left)
                if d is None:
                    raise PlanError(f"{e.op.upper()} requires a string "
                                    f"column")
                return self._lower_like(left, d, e.right.value,
                                        ci=e.op == "ilike")
            left = self._lower_strings(e.left)
            right = self._lower_strings(e.right)
            if isinstance(left, (SubQuery, InSub)) or isinstance(
                right, (SubQuery, InSub)
            ):
                # Defer: the subquery substitutes a literal at first
                # execution, and lowering re-runs then.
                return BinOp(e.op, left, right)
            if e.op in self._CMP_OPS:
                ld = self._expr_str_dict(left)
                rd = self._expr_str_dict(right)
                llit = isinstance(left, Lit) and isinstance(left.value, str)
                rlit = isinstance(right, Lit) and isinstance(right.value, str)
                l_str = ld is not None or llit
                r_str = rd is not None or rlit
                if l_str != r_str:
                    raise PlanError(
                        "Cannot compare string and numeric values"
                    )
                if ld is not None and rlit:
                    return self._lower_str_cmp(e.op, left, ld, right.value)
                if rd is not None and llit:
                    return self._lower_str_cmp(
                        self._MIRROR[e.op], right, rd, left.value
                    )
                if llit and rlit:
                    res = {
                        "=": left.value == right.value,
                        "!=": left.value != right.value,
                        "<": left.value < right.value,
                        "<=": left.value <= right.value,
                        ">": left.value > right.value,
                        ">=": left.value >= right.value,
                    }[e.op]
                    return Lit(1 if res else 0)
                if (ld is not None and rd is not None
                        and not np.array_equal(ld, rd)):
                    # pass-1 merging unifies named COLUMNS; a string
                    # FUNCTION result (CodeMap) has no registry entry to
                    # merge, so unequal dictionaries here mean at least
                    # one derived side — reject rather than compare codes
                    # from different dictionaries.
                    raise PlanError(
                        "Cannot compare string expressions with different "
                        "dictionaries; compare against literals instead"
                    )
                # both dictionary-typed: dictionaries were merged in pass 1
                # (or are equal), codes compare directly.
            elif e.op in ("+", "-", "*", "/", "%"):
                if self._is_string_typed(left) or self._is_string_typed(right):
                    raise PlanError(
                        "String columns do not support arithmetic"
                    )
            return BinOp(e.op, left, right)
        return e

