"""Aggregate-slot lowering (split out of ``plan/planner.py`` in round 5 —
the round-4 verdict flagged the planner's regrowth; behavior unchanged).

Each extracted ``Agg`` node lowers to:

  * ``agg_arg_cols``   — argument columns to materialize before the
    group-by (expressions; NULL-skipping masks fold in as flag-guarded
    CASE so they ride the group-by sort like any payload);
  * ``agg_specs``      — (source, op, output) triples for
    ``ops.groupby.groupby_batch`` (COUNT(DISTINCT) over a nullable
    argument uses the (value, valid) pair form — no sentinel values);
  * ``post_computes``  — derivations over the grouped outputs (AVG =
    sum/count; mask0 = zero the neutral extreme of all-NULL min/max/prod
    groups in the raw matrix);
  * ``agg_null_flags`` — SQL NULL result semantics: SUM/AVG/MIN/MAX/PROD
    of a group with no non-NULL input is NULL (COUNT is 0); the flag
    column is a count-valued "has any valid row" indicator threaded into
    the hidden output NULL indicators by ``run_tail``. With GROUP BY keys
    every group is non-empty, so plain (non-nullable-arg) aggregates need
    a flag only for the implicit single group over empty input — the
    broadcast ``#grp_has`` column fabricated in ``_phase_b_impl``.

Reference contract: the agg opcode set {sum, prod, max, min}
(``parse.py:81``) extended with count/avg/count(distinct).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from harkdb_tpu.sql.ast_nodes import Agg, Case, Col, Lit, Star, UnOp, walk

_I32_MAX, _I32_MIN = (1 << 31) - 1, -(1 << 31)

#: Aggregates lowered to sum/sumsq/count + a post-compute (sample variants
#: are NULL below 2 rows, population variants below 1).
VAR_FUNCS = {"stddev", "variance", "stddev_samp", "var_samp",
             "stddev_pop", "var_pop"}


def quantile_op(func: str):
    """Aggregate func name → the groupby "quantile@q" op string, or None.
    MEDIAN(x) = QUANTILE(x, 0.5)."""
    if func == "median":
        return "quantile@0.5"
    if func.startswith("quantile@"):
        return func
    return None


def apply_post_computes(gcols, post_computes) -> None:
    """Derive post-aggregation columns in-place over the grouped columns.

    Shared by the single-chip tail (``run_tail``) and the distributed
    executor's ``aug``. Spec kinds (first element; variable arity):

      * ("avg", sum, cnt)                — sum/count (float)
      * ("mask0", raw, has)             — zero the neutral extreme of
        all-NULL min/max/prod groups in the raw matrix
      * ("var", sumsq, sum, cnt, ddof, sqrt) — population/sample
        variance from the float sums (E[x²]-E[x]² with the ddof
        denominator, clamped at 0); sqrt=True → stddev
      * ("nsub1", cnt)                  — max(cnt-1, 0): the validity
        flag of sample variance/stddev (NULL below 2 rows)
    """
    import jax.numpy as jnp

    for out, spec in post_computes:
        kind = spec[0]
        if kind == "avg":
            _k, s, c = spec
            gcols[out] = gcols[s].astype(jnp.float32) / jnp.maximum(
                gcols[c], 1
            ).astype(jnp.float32)
        elif kind == "mask0":
            _k, s, c = spec
            gcols[out] = jnp.where(
                gcols[c] > 0, gcols[s], jnp.zeros((), gcols[s].dtype)
            )
        elif kind == "var":
            _k, sq, s, c, ddof, use_sqrt = spec
            cf = gcols[c].astype(jnp.float32)
            sf = gcols[s].astype(jnp.float32)
            qf = gcols[sq].astype(jnp.float32)
            denom = jnp.maximum(cf - ddof, 1.0)
            var = jnp.maximum(
                (qf - sf * sf / jnp.maximum(cf, 1.0)) / denom, 0.0
            )
            gcols[out] = jnp.sqrt(var) if use_sqrt else var
        elif kind == "nsub1":
            _k, c = spec
            gcols[out] = jnp.maximum(gcols[c] - 1, 0).astype(jnp.int32)


def _lower_var(plan, i: int, out: str, node: Agg, masked=None) -> None:
    """STDDEV/VARIANCE (sample; *_POP population): float sum + sum-of-
    squares + count per group, combined in a post-compute. Sample
    variants are NULL below 2 rows (the max(c-1,0) flag), population
    variants below 1 (the count itself is the flag). ``masked`` wraps
    arguments for NULL-skipping over nullable columns."""
    from harkdb_tpu.sql.ast_nodes import BinOp, UnOp

    fexpr = UnOp("cast_float", node.arg)
    sqexpr = BinOp("*", fexpr, fexpr)
    cexpr = Lit(1)
    if masked is not None:
        fexpr = masked(fexpr, Lit(0.0))
        sqexpr = masked(sqexpr, Lit(0.0))
        cexpr = masked(Lit(1), Lit(0))
    sq, s, c = f"#var_q{i}", f"#var_s{i}", f"#var_c{i}"
    qi, si, ci = f"#aggargq{i}", f"#aggargs{i}", f"#aggargn{i}"
    plan.agg_arg_cols += [(qi, sqexpr), (si, fexpr), (ci, cexpr)]
    plan.agg_specs += [(qi, "sum", sq), (si, "sum", s), (ci, "sum", c)]
    samp = node.func in ("stddev", "variance", "stddev_samp", "var_samp")
    use_sqrt = node.func.startswith("stddev")
    plan.post_computes.append(
        (out, ("var", sq, s, c, 1 if samp else 0, use_sqrt))
    )
    if samp:
        vf = f"#varflag{i}"
        plan.post_computes.append((vf, ("nsub1", c)))
        plan.agg_null_flags[out] = vf
    else:
        plan.agg_null_flags[out] = c


def lower_aggregates(plan, agg_nodes: List[Agg], tables,
                     bindings) -> Dict[Agg, str]:
    """Populate ``plan``'s aggregate containers; returns Agg → output
    column for the post-group substitution."""
    plan.agg_arg_cols: List[Tuple[str, object]] = []
    plan.agg_specs: List[Tuple] = []
    plan.post_computes: List[Tuple[str, object]] = []
    # MIN/MAX over a string column preserve dictionary codes — their
    # output columns decode through the argument's dictionary.
    plan.agg_out_dicts: Dict[str, np.ndarray] = {}
    agg_map: Dict[Agg, str] = {}

    def expr_is_float(e) -> bool:
        """Best-effort dtype probe for masked-aggregate neutrals."""
        for nd in walk(e):
            if isinstance(nd, Col) and "." in nd.name:
                bb, cc = nd.name.split(".", 1)
                tn = next((t for b2, t, _ in bindings if b2 == bb), None)
                if tn is not None:
                    a = plan._source(tables, tn).host_columns.get(cc)
                    if a is not None and np.issubdtype(
                        a.dtype, np.floating
                    ):
                        return True
            if isinstance(nd, Lit) and isinstance(nd.value, float):
                return True
            if isinstance(nd, UnOp) and nd.op == "sqrt":
                return True
        return False

    implicit_group = not plan.group_keys
    for i, node in enumerate(agg_nodes):
        out = f"#agg{i}"
        if node.func in ("min", "max") and not isinstance(node.arg, Star):
            d = plan._expr_str_dict(node.arg)
            if d is not None:
                plan.agg_out_dicts[out] = d
        if isinstance(node.arg, Star):        # count(*) counts ALL rows
            plan.agg_specs.append(("#ones", "count", out))
            agg_map[node] = out
            continue
        # NULL-skipping: aggregates over nullable (outer-join) columns
        # ignore NULL rows. The mask folds into the argument as a CASE
        # on the matched flags — it rides the groupby sort like
        # everything else.
        nflags = plan._nullable_flags_in(node.arg)
        if nflags:
            cond = plan._matched_cond(nflags)

            def masked(val, neutral, _c=cond):
                return Case(((_c, val),), neutral)

            arg_internal = f"#aggarg{i}"
            if node.func == "sum":
                hm, hi = f"#has{i}", f"#aggargh{i}"
                plan.agg_arg_cols.append(
                    (arg_internal, masked(node.arg, Lit(0)))
                )
                plan.agg_arg_cols.append((hi, masked(Lit(1), Lit(0))))
                plan.agg_specs.append((arg_internal, "sum", out))
                plan.agg_specs.append((hi, "sum", hm))
                plan.agg_null_flags[out] = hm
            elif node.func == "count" and not node.distinct:
                plan.agg_arg_cols.append(
                    (arg_internal, masked(Lit(1), Lit(0)))
                )
                plan.agg_specs.append((arg_internal, "sum", out))
            elif node.func == "avg":
                s, c = f"#avg_s{i}", f"#avg_c{i}"
                ci = f"#aggargc{i}"
                plan.agg_arg_cols.append(
                    (arg_internal, masked(node.arg, Lit(0)))
                )
                plan.agg_arg_cols.append((ci, masked(Lit(1), Lit(0))))
                plan.agg_specs.append((arg_internal, "sum", s))
                plan.agg_specs.append((ci, "sum", c))
                plan.post_computes.append((out, ("avg", s, c)))
                plan.agg_null_flags[out] = c
            elif node.func in VAR_FUNCS:
                _lower_var(plan, i, out, node, masked=masked)
            elif quantile_op(node.func) is not None:
                # NULL-skipping quantile: the validity mask rides the aux
                # sort as a key (invalid rows trail the group) and the
                # valid-row count is the NULL flag (empty → NULL)
                vi, c = f"#aggargv{i}", f"#qcnt{i}"
                plan.agg_arg_cols.append((arg_internal, node.arg))
                plan.agg_arg_cols.append((vi, masked(Lit(1), Lit(0))))
                plan.agg_specs.append(
                    ((arg_internal, vi), quantile_op(node.func), out)
                )
                plan.agg_specs.append((vi, "sum", c))
                plan.agg_null_flags[out] = c
            elif node.func == "count" and node.distinct:
                # COUNT(DISTINCT x) over a nullable x: the validity
                # mask rides the aux sort as an extra key operand
                # (ops/groupby.py countd (value, valid) form) — exact,
                # no sentinel value to collide with real data.
                vi = f"#aggargv{i}"
                plan.agg_arg_cols.append((arg_internal, node.arg))
                plan.agg_arg_cols.append((vi, masked(Lit(1), Lit(0))))
                plan.agg_specs.append(
                    ((arg_internal, vi), "countd", out)
                )
            else:                         # min / max / prod
                if node.func == "prod":
                    neutral = Lit(1)
                elif expr_is_float(node.arg):
                    neutral = Lit(float("inf") if node.func == "min"
                                  else float("-inf"))
                else:
                    neutral = Lit(_I32_MAX if node.func == "min"
                                  else _I32_MIN)
                raw, hm = f"#mraw{i}", f"#hasm{i}"
                hmi = f"#aggargm{i}"
                plan.agg_arg_cols.append(
                    (arg_internal, masked(node.arg, neutral))
                )
                plan.agg_arg_cols.append((hmi, masked(Lit(1), Lit(0))))
                plan.agg_specs.append((arg_internal, node.func, raw))
                plan.agg_specs.append((hmi, "max", hm))
                # all-NULL groups: raw holds the neutral extreme — show
                # 0 in the raw matrix (sql), NULL through the flag
                plan.post_computes.append((out, ("mask0", raw, hm)))
                plan.agg_null_flags[out] = hm
            agg_map[node] = out
            continue
        if node.func in VAR_FUNCS:
            _lower_var(plan, i, out, node)
            agg_map[node] = out
            continue
        if quantile_op(node.func) is not None:
            arg_internal = f"#aggarg{i}"
            if isinstance(node.arg, Col):
                arg_internal = node.arg.name
            else:
                plan.agg_arg_cols.append((arg_internal, node.arg))
            plan.agg_specs.append(
                (arg_internal, quantile_op(node.func), out)
            )
            if implicit_group:
                plan.agg_null_flags[out] = "#grp_has"
            agg_map[node] = out
            continue
        arg_internal = f"#aggarg{i}"
        if isinstance(node.arg, Col):
            arg_internal = node.arg.name       # no copy needed
        else:
            plan.agg_arg_cols.append((arg_internal, node.arg))
        if node.func == "avg":
            s, c = f"#avg_s{i}", f"#avg_c{i}"
            plan.agg_specs.append((arg_internal, "sum", s))
            plan.agg_specs.append((arg_internal, "count", c))
            plan.post_computes.append((out, ("avg", s, c)))
            if implicit_group:
                plan.agg_null_flags[out] = c
        elif node.func == "count" and node.distinct:
            # COUNT(DISTINCT x) → the dedicated "countd" aggregate
            # (ops/groupby.py: per-group distinct counts via an auxiliary
            # sort with x as a trailing key). The parser restricts
            # DISTINCT-in-aggregate to COUNT.
            plan.agg_specs.append((arg_internal, "countd", out))
        else:
            plan.agg_specs.append((arg_internal, node.func, out))
            if implicit_group and node.func != "count":
                # SUM/MIN/MAX/PROD over EMPTY input is NULL in SQL
                plan.agg_null_flags[out] = "#grp_has"
        agg_map[node] = out
    return agg_map
