"""Randomized differential testing: random SQL queries vs a pandas oracle.

Complements the targeted suites (test_sql.py / test_features.py) by sweeping
the clause-combination space — especially the planner's fused-mask paths
(WHERE into GROUP BY / ORDER BY / DISTINCT, HAVING into ORDER BY), empty
results, and all-rows-masked edges. Deterministic seeds; engine semantics
under comparison:

  * ungrouped output preserves input row order (SURVEY §3.3);
  * grouped output is ascending by key (SURVEY §3.4);
  * ORDER BY is a stable sort over the engine's pre-order.

Comparisons therefore sort both sides canonically by all columns, and
separately assert the engine's ORDER BY key sequence is monotone.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context


def _make_tables(rng: np.random.Generator, n: int):
    t1 = pd.DataFrame({
        "a": rng.integers(0, 6, n).astype(np.int32),
        "b": rng.integers(-8, 9, n).astype(np.int32),
        "c": rng.integers(0, 50, n).astype(np.int32),
        "f": rng.normal(0.0, 10.0, n).astype(np.float32),
    })
    t2 = pd.DataFrame({
        "j": rng.permutation(8).astype(np.int32),
        "w": rng.integers(-5, 20, 8).astype(np.int32),
    })
    return t1, t2


_PREDS = [
    ("b > 0", lambda d: d.b > 0),
    ("c >= 25 and b < 5", lambda d: (d.c >= 25) & (d.b < 5)),
    ("a in (1, 3, 5)", lambda d: d.a.isin([1, 3, 5])),
    ("c between 10 and 30", lambda d: (d.c >= 10) & (d.c <= 30)),
    ("b > 100", lambda d: d.b > 100),                      # empty result
    ("not (a = 2) or b = -3", lambda d: (d.a != 2) | (d.b == -3)),
]


def _canon(arr: np.ndarray) -> np.ndarray:
    if arr.size == 0:
        return arr
    return arr[np.lexsort(arr.T[::-1])]


def _assert_rows_equal(got: np.ndarray, exp: np.ndarray, q: str):
    assert got.shape == exp.shape, (q, got.shape, exp.shape)
    g, e = _canon(np.asarray(got, np.float64)), _canon(
        np.asarray(exp, np.float64)
    )
    np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-5, err_msg=q)


def _assert_monotone(col: np.ndarray, descending: bool, q: str):
    if col.size < 2:
        return
    d = np.diff(col.astype(np.float64))
    if descending:
        assert (d <= 1e-9).all(), (q, col)
    else:
        assert (d >= -1e-9).all(), (q, col)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_ungrouped(seed):
    rng = np.random.default_rng(1000 + seed)
    t1, _ = _make_tables(rng, int(rng.integers(1, 200)))
    ctx = Context()
    ctx.create_table("t1", t1)

    sql_pred, oracle_pred = _PREDS[seed % len(_PREDS)]
    order_col = ["a", "b", "c"][seed % 3]
    desc = bool(seed % 2)
    distinct = seed % 4 == 0

    sel = "distinct a, b" if distinct else "a, b, c"
    q = (f"select {sel} from t1 where {sql_pred} "
         f"order by {order_col} {'desc' if desc else 'asc'}")
    got = ctx.sql(q)

    df = t1[oracle_pred(t1)]
    cols = ["a", "b"] if distinct else ["a", "b", "c"]
    exp_df = df[cols].drop_duplicates() if distinct else df[cols]
    _assert_rows_equal(got, exp_df.to_numpy(), q)
    if got.size and order_col in cols:
        _assert_monotone(got[:, cols.index(order_col)], desc, q)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_grouped(seed):
    rng = np.random.default_rng(2000 + seed)
    t1, _ = _make_tables(rng, int(rng.integers(1, 300)))
    ctx = Context()
    ctx.create_table("t1", t1)

    sql_pred, oracle_pred = _PREDS[(seed + 1) % len(_PREDS)]
    keys = ["a"] if seed % 2 else ["a", "b"]
    having = seed % 3 == 0

    key_sql = ", ".join(keys)
    q = (f"select {key_sql}, sum(c), min(b), max(c), count(*), avg(f) "
         f"from t1 where {sql_pred} group by {key_sql}"
         + (" having count(*) > 1" if having else "")
         + f" order by {key_sql}")
    got = ctx.sql(q)

    df = t1[oracle_pred(t1)]
    g = df.groupby(keys).agg(
        s=("c", "sum"), mn=("b", "min"), mx=("c", "max"),
        n=("c", "size"), av=("f", "mean"),
    ).reset_index()
    if having:
        g = g[g.n > 1]
    exp = g.sort_values(keys).to_numpy()
    _assert_rows_equal(got, exp, q)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_join(seed):
    rng = np.random.default_rng(3000 + seed)
    t1, t2 = _make_tables(rng, int(rng.integers(1, 150)))
    ctx = Context()
    ctx.create_table("t1", t1)
    ctx.create_table("t2", t2)

    sql_pred, oracle_pred = _PREDS[seed % len(_PREDS)]
    grouped = seed % 2 == 0

    if grouped:
        q = (f"select a, sum(w), count(*) from t1 "
             f"join t2 on t1.a = t2.j where {sql_pred} "
             f"group by a order by a")
    else:
        q = (f"select a, b, w from t1 join t2 on t1.a = t2.j "
             f"where {sql_pred} order by c")
    got = ctx.sql(q)

    m = t1.merge(t2, left_on="a", right_on="j")
    m = m[oracle_pred(m)]
    if grouped:
        g = m.groupby("a").agg(s=("w", "sum"), n=("w", "size")).reset_index()
        exp = g.sort_values("a").to_numpy()
    else:
        exp = m[["a", "b", "w"]].to_numpy()
    _assert_rows_equal(got, exp, q)


def test_fuzz_all_rows_masked_grouped():
    rng = np.random.default_rng(7)
    t1, _ = _make_tables(rng, 64)
    ctx = Context()
    ctx.create_table("t1", t1)
    out = ctx.sql(
        "select a, sum(b) from t1 where b > 1000 group by a order by a"
    )
    assert out.shape == (0, 2)


def test_fuzz_left_join_where():
    rng = np.random.default_rng(11)
    t1, t2 = _make_tables(rng, 80)
    t2 = t2[t2.j < 4]                       # some t1.a values unmatched
    ctx = Context()
    ctx.create_table("t1", t1)
    ctx.create_table("t2", t2)
    q = "select a, b, w from t1 left join t2 on t1.a = t2.j where b > 0 order by a"
    got = ctx.sql(q)
    m = t1.merge(t2, left_on="a", right_on="j", how="left").fillna(0)
    m = m[m.b > 0]
    _assert_rows_equal(got, m[["a", "b", "w"]].to_numpy(), q)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_new_features(seed):
    """count(distinct), CASE WHEN inside aggregates, ABS — vs pandas."""
    rng = np.random.default_rng(4000 + seed)
    t1, _ = _make_tables(rng, int(rng.integers(1, 300)))
    ctx = Context()
    ctx.create_table("t1", t1)

    sql_pred, oracle_pred = _PREDS[seed % len(_PREDS)]
    q = (f"select a, count(distinct b), sum(case when b > 0 then c "
         f"else 0 end), max(abs(b)) from t1 where {sql_pred} "
         f"group by a order by a")
    got = ctx.sql(q)

    df = t1[oracle_pred(t1)].copy()
    df["cc"] = np.where(df.b > 0, df.c, 0)
    df["ab"] = np.abs(df.b)
    g = df.groupby("a").agg(
        nd=("b", "nunique"), s=("cc", "sum"), mx=("ab", "max")
    ).reset_index()
    _assert_rows_equal(got, g.sort_values("a").to_numpy(), q)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_distributed_matches_single(seed):
    """Random clause combinations, 8-device mesh vs single chip — sweeps
    the distributed tail (range-partitioned ORDER BY, sharded LIMIT/OFFSET,
    sharded DISTINCT, MXU/sort pre-aggregates) against the single-chip
    path, which the other fuzzers pin against pandas."""
    from harkdb_tpu.parallel import make_engine_mesh

    rng = np.random.default_rng(5000 + seed)
    t1, t2 = _make_tables(rng, int(rng.integers(50, 400)))
    mesh = make_engine_mesh(8)
    dc = Context(mesh=mesh)
    sc = Context()
    for c in (dc, sc):
        c.create_table("t1", t1)
        c.create_table("t2", t2)

    sql_pred, _ = _PREDS[seed % len(_PREDS)]
    queries = [
        f"select a, b, c from t1 where {sql_pred} order by b desc, c "
        f"limit {5 + seed * 3} offset {seed}",
        f"select distinct a, b from t1 where {sql_pred} order by a",
        "select a, count(distinct c), sum(b) from t1 group by a order by a",
        f"select a, c, w from t1 join t2 on t1.a = t2.j where {sql_pred} "
        "order by w, c limit 40",
    ]
    q = queries[seed % len(queries)]
    np.testing.assert_array_equal(dc.sql(q), sc.sql(q), err_msg=q)


_SPREDS = [
    ("s = 'gamma'", lambda d: d.s == "gamma"),
    ("s != 'alpha'", lambda d: d.s != "alpha"),
    ("s < 'delta'", lambda d: d.s < "delta"),
    ("s >= 'beta'", lambda d: d.s >= "beta"),
    ("s like '%a'", lambda d: d.s.str.endswith("a")),
    ("s in ('alpha', 'eps', 'zzz')", lambda d: d.s.isin(["alpha", "eps"])),
    ("s between 'b' and 'e'", lambda d: (d.s >= "b") & (d.s <= "e")),
    ("s not like 'b%'", lambda d: ~d.s.str.startswith("b")),
]

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_strings(seed):
    """String predicates (dictionary-code lowering) + string group keys vs
    pandas; distributed parity on even seeds."""
    rng = np.random.default_rng(6000 + seed)
    n = int(rng.integers(1, 300))
    t1 = pd.DataFrame({
        "s": rng.choice(_WORDS, n),
        "b": rng.integers(-8, 9, n).astype(np.int32),
        "c": rng.integers(0, 50, n).astype(np.int32),
    })
    ctx = Context()
    ctx.create_table("t1", t1)

    sql_pred, oracle_pred = _SPREDS[seed % len(_SPREDS)]
    q = (f"select s, sum(c), count(distinct b), min(s), max(b) from t1 "
         f"where {sql_pred} group by s order by s")
    got_df = ctx.sql_df(q)

    df = t1[oracle_pred(t1)]
    g = df.groupby("s").agg(
        sc=("c", "sum"), nd=("b", "nunique"), mn=("s", "min"),
        mx=("b", "max"),
    ).reset_index().sort_values("s")
    assert got_df["s"].tolist() == g["s"].tolist(), q
    assert got_df.iloc[:, 1].tolist() == g["sc"].tolist(), q
    assert got_df.iloc[:, 2].tolist() == g["nd"].tolist(), q
    assert got_df.iloc[:, 3].tolist() == g["mn"].tolist(), q
    assert got_df.iloc[:, 4].tolist() == g["mx"].tolist(), q

    if seed % 2 == 0:
        from harkdb_tpu.parallel import make_engine_mesh

        dc = Context(mesh=make_engine_mesh(8))
        dc.create_table("t1", t1)
        pd.testing.assert_frame_equal(
            dc.sql_df(q), got_df, check_dtype=False
        )


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_union_subquery(seed):
    """UNION [ALL] arms with random predicates, and scalar/IN subqueries —
    vs pandas composition."""
    rng = np.random.default_rng(7000 + seed)
    t1, t2 = _make_tables(rng, int(rng.integers(20, 300)))
    ctx = Context()
    ctx.create_table("t1", t1)
    ctx.create_table("t2", t2)

    p1, o1 = _PREDS[seed % len(_PREDS)]
    p2, o2 = _PREDS[(seed + 2) % len(_PREDS)]
    use_all = seed % 2 == 0

    q = (f"select a, b from t1 where {p1} "
         f"union {'all ' if use_all else ''}select a, b from t1 where {p2} "
         f"order by a, b")
    got = ctx.sql(q)
    w1 = t1[o1(t1)][["a", "b"]]
    w2 = t1[o2(t1)][["a", "b"]]
    exp = pd.concat([w1, w2], ignore_index=True)
    if not use_all:
        exp = exp.drop_duplicates()
    _assert_rows_equal(got, exp.to_numpy(), q)

    q2 = (f"select a, c from t1 where c > (select avg(c) from t1) "
          f"and a in (select j from t2 where w > 0)")
    got2 = ctx.sql(q2)
    hot = set(t2[t2.w > 0].j)
    exp2 = t1[(t1.c > t1.c.mean()) & t1.a.isin(hot)][["a", "c"]]
    _assert_rows_equal(got2, exp2.to_numpy(), q2)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_round4_surface(seed):
    """Round-4 surface sweep vs pandas: LEFT-JOIN NULLs (IS NULL, agg
    skip, COALESCE), EXISTS semi-joins, derived tables, window frames and
    windows over grouped output — random predicates and sizes."""
    rng = np.random.default_rng(7000 + seed)
    n = int(rng.integers(40, 400))
    t1, _ = _make_tables(rng, n)
    t2 = pd.DataFrame({
        "j": rng.permutation(12)[:6].astype(np.int32),   # half the keys miss
        "w": rng.integers(1, 30, 6).astype(np.int32),
    })
    ctx = Context()
    ctx.create_table("t1", t1)
    ctx.create_table("t2", t2)
    m = t1.merge(t2, left_on="a", right_on="j", how="left")
    sql_pred, pd_pred = _PREDS[seed % len(_PREDS)]

    kind = seed % 4
    if kind == 0:
        # NULL-aware aggregates + COALESCE through a LEFT JOIN
        q = (f"select a, count(w) as cw, sum(coalesce(w, -2)) as s "
             f"from t1 left join t2 on t1.a = t2.j where {sql_pred} "
             f"group by a order by a")
        got = ctx.sql(q)
        mm = m[pd_pred(m)]
        g = mm.groupby("a").agg(
            cw=("w", "count"),
            s=("w", lambda x: int(x.fillna(-2).sum())),
        ).reset_index()
        _assert_rows_equal(got, g.to_numpy(), q)
    elif kind == 1:
        # EXISTS / NOT EXISTS semi-joins
        neg = "not " if seed % 2 else ""
        q = (f"select count(*) from t1 where {neg}exists "
             f"(select 1 from t2 where t2.j = t1.a) and ({sql_pred})")
        got = ctx.sql(q)
        member = t1.a.isin(set(t2.j.tolist()))
        if neg:
            member = ~member
        exp = int((member & pd_pred(t1)).sum())
        assert got[0, 0] == exp, (q, got, exp)
    elif kind == 2:
        # derived table: regroup over an aggregate
        q = (f"select count(*), sum(d.s) from "
             f"(select a, b, sum(c) as s from t1 where {sql_pred} "
             f"group by a, b) d where d.s > 20")
        got = ctx.sql(q)
        g = t1[pd_pred(t1)].groupby(["a", "b"]).c.sum()
        g = g[g > 20]
        assert got[0, 0] == len(g), q
        assert got[0, 1] == int(g.sum()), q
    else:
        # sliding frame + window over grouped output
        k = 1 + seed % 4
        q = (f"select a, sum(c) as s, "
             f"sum(sum(c)) over (order by a rows between {k} preceding "
             f"and current row) as fr from t1 group by a order by a")
        got = ctx.sql_df(q)
        g = t1.groupby("a").c.sum()
        fr = g.rolling(k + 1, min_periods=1).sum().astype(int)
        assert got["s"].tolist() == g.tolist(), q
        assert got["fr"].tolist() == fr.tolist(), q


# ---- round-5 surface sweep: 3VL predicates, NULL aggregates, join kinds --

_NULLABLE_PREDS = [
    # (sql over l LEFT JOIN r ON l.a = r.j, pandas mask over the merge;
    #  pandas NaN semantics == SQL 3VL: NaN comparisons are False,
    #  .notna() guards express the NOT cases)
    ("r.w > 0", lambda m: m.w > 0),
    ("not (r.w > 0)", lambda m: m.w.notna() & ~(m.w > 0)),
    ("r.w > 0 or l.b < 0", lambda m: (m.w > 0) | (m.b < 0)),
    ("r.w + l.b > 5", lambda m: (m.w + m.b) > 5),
    ("not (r.w > 0 and l.b < 0)",
     lambda m: (m.w.notna() & ~(m.w > 0)) | ~(m.b < 0)),
    ("r.w is null or r.w > 10", lambda m: m.w.isna() | (m.w > 10)),
    ("r.w between -2 and 8", lambda m: (m.w >= -2) & (m.w <= 8)),
    ("r.w in (0, 1, 2, 3)", lambda m: m.w.isin([0, 1, 2, 3])),
]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_3vl_where(seed):
    """Kleene WHERE over nullable LEFT-JOIN columns vs the pandas oracle
    (round-5 item 1's 'fuzz extended with nullable WHERE clauses')."""
    rng = np.random.default_rng(7000 + seed)
    n = int(rng.integers(5, 250))
    t1 = pd.DataFrame({
        "a": rng.integers(0, 14, n).astype(np.int32),   # keys 8-13 unmatched
        "b": rng.integers(-8, 9, n).astype(np.int32),
    })
    t2 = pd.DataFrame({
        "j": rng.permutation(8).astype(np.int32),
        "w": rng.integers(-5, 20, 8).astype(np.int32),
    })
    ctx = Context()
    ctx.create_table("l", t1)
    ctx.create_table("r", t2)
    sql_pred, oracle = _NULLABLE_PREDS[seed % len(_NULLABLE_PREDS)]
    q = (f"select l.a, l.b from l left join r on l.a = r.j "
         f"where {sql_pred} order by l.a, l.b")
    got = ctx.sql(q)
    m = t1.merge(t2, left_on="a", right_on="j", how="left")
    exp = m[oracle(m).fillna(False)][["a", "b"]].sort_values(["a", "b"])
    _assert_rows_equal(got, exp.to_numpy(), q)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_null_aggregates(seed):
    """SUM/AVG/MIN/MAX over nullable columns: NULL for all-NULL groups,
    exact skip semantics elsewhere — matched against pandas NaN math."""
    rng = np.random.default_rng(7100 + seed)
    n = int(rng.integers(10, 300))
    t1 = pd.DataFrame({
        "a": rng.integers(0, 12, n).astype(np.int32),
        "b": rng.integers(-8, 9, n).astype(np.int32),
    })
    t2 = pd.DataFrame({
        "j": rng.permutation(6).astype(np.int32),
        "w": rng.integers(-5, 20, 6).astype(np.int32),
    })
    ctx = Context()
    ctx.create_table("l", t1)
    ctx.create_table("r", t2)
    agg = ["sum", "avg", "min", "max"][seed % 4]
    q = (f"select l.a, {agg}(r.w) as x, count(r.w) as c from l "
         f"left join r on l.a = r.j group by l.a order by l.a")
    got = ctx.sql_df(q)
    m = t1.merge(t2, left_on="a", right_on="j", how="left")
    fn = {"sum": lambda s: s.sum(min_count=1), "avg": "mean",
          "min": "min", "max": "max"}[agg]
    exp = m.groupby("a")["w"].agg(fn)
    np.testing.assert_allclose(
        got["x"].to_numpy(np.float64), exp.to_numpy(np.float64),
        rtol=1e-6, err_msg=q,
    )
    assert got["c"].tolist() == m.groupby("a")["w"].count().tolist()


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_join_kinds(seed):
    """Multi-key / RIGHT / FULL OUTER joins vs pandas merge."""
    rng = np.random.default_rng(7200 + seed)
    nl, nr = int(rng.integers(5, 200)), int(rng.integers(5, 120))
    a = pd.DataFrame({
        "u": rng.integers(0, 9, nl).astype(np.int32),
        "v": rng.integers(0, 4, nl).astype(np.int32),
        "x": rng.integers(-50, 50, nl).astype(np.int32),
    })
    b = pd.DataFrame({
        "p": rng.integers(0, 9, nr).astype(np.int32),
        "q": rng.integers(0, 5, nr).astype(np.int32),
        "w": rng.integers(0, 100, nr).astype(np.int32),
    })
    ctx = Context()
    ctx.create_table("a", a)
    ctx.create_table("b", b)
    kind, how = [("join", "inner"), ("left join", "left"),
                 ("right join", "right"),
                 ("full outer join", "outer")][seed % 4]
    multi = seed % 2 == 0
    on_sql = ("a.u = b.p and a.v = b.q" if multi else "a.u = b.p")
    on_l, on_r = (["u", "v"], ["p", "q"]) if multi else (["u"], ["p"])
    q = (f"select a.x, b.w from a {kind} b on {on_sql} "
         f"order by a.x nulls last, b.w nulls last")
    got = ctx.sql_df(q)
    m = a.merge(b, left_on=on_l, right_on=on_r, how=how)
    exp = m[["x", "w"]].sort_values(["x", "w"], na_position="last")
    np.testing.assert_array_equal(
        got["x"].to_numpy(np.float64), exp["x"].to_numpy(np.float64),
        err_msg=q,
    )
    np.testing.assert_array_equal(
        got["w"].to_numpy(np.float64), exp["w"].to_numpy(np.float64),
        err_msg=q,
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_3vl_distributed_parity(seed):
    """The 3VL/NULL paths must be bit-equal between single-chip and the
    8-device mesh (round-5 item 1: 'distributed bit-equal')."""
    from harkdb_tpu.parallel import make_engine_mesh

    rng = np.random.default_rng(7300 + seed)
    n = int(rng.integers(50, 400))
    t1 = pd.DataFrame({
        "a": rng.integers(0, 14, n).astype(np.int32),
        "b": rng.integers(-8, 9, n).astype(np.int32),
    })
    t2 = pd.DataFrame({
        "j": rng.permutation(8).astype(np.int32),
        "w": rng.integers(-5, 20, 8).astype(np.int32),
    })
    cs = Context()
    cm = Context(mesh=make_engine_mesh(8))
    for c in (cs, cm):
        c.create_table("l", t1)
        c.create_table("r", t2)
    sql_pred, _ = _NULLABLE_PREDS[seed % len(_NULLABLE_PREDS)]
    for q in [
        f"select l.a, l.b, r.w from l left join r on l.a = r.j "
        f"where {sql_pred} order by l.a, l.b, r.w",
        "select l.a, sum(r.w) as s, avg(r.w) as av from l "
        "left join r on l.a = r.j group by l.a "
        "having count(*) > 1 order by l.a",
        "select a.u, b.w from (select a as u from l where b > 0) a "
        "full outer join (select j, w from r where w > 2) b "
        "on a.u = b.j order by a.u nulls last, b.w nulls last",
    ]:
        pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))
