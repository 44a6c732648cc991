"""Expression-feature differential tests vs pandas: CASE WHEN, ABS.

Round-2 advice: these features shipped without tests (and COUNT DISTINCT
shipped silently wrong — tests/test_count_distinct.py). Every query here is
checked row-for-row against a pandas oracle.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context


@pytest.fixture
def ctx(rng):
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n).astype(np.int32),
        "v": rng.integers(-100, 100, n).astype(np.int32),
        "w": rng.integers(1, 50, n).astype(np.int32),
    })
    c = Context()
    c.create_table("t", df)
    return c, df


class TestCase:
    def test_multi_when_with_else(self, ctx):
        c, df = ctx
        out = c.sql_df(
            "select case when v > 50 then 2 when v > 0 then 1 "
            "else 0 end as b from t"
        )
        exp = np.select([df.v > 50, df.v > 0], [2, 1], default=0)
        np.testing.assert_array_equal(out["b"], exp)

    def test_multi_when_no_else(self, ctx):
        """Without ELSE, non-matching rows are 0 (the engine has no NULLs,
        like the reference's homogeneous numeric tables)."""
        c, df = ctx
        out = c.sql_df(
            "select case when v > 50 then 7 when v < -50 then 3 end as b "
            "from t"
        )
        exp = np.select([df.v > 50, df.v < -50], [7, 3], default=0)
        np.testing.assert_array_equal(out["b"], exp)

    def test_case_inside_sum(self, ctx):
        c, df = ctx
        out = c.sql_df(
            "select k, sum(case when v > 0 then w else 0 end) as s "
            "from t group by k order by k"
        )
        exp = (
            df.assign(x=np.where(df.v > 0, df.w, 0))
            .groupby("k")["x"].sum().reset_index()
        )
        np.testing.assert_array_equal(out["k"], exp["k"])
        np.testing.assert_array_equal(out["s"], exp["x"])

    def test_case_in_where(self, ctx):
        c, df = ctx
        out = c.sql_df(
            "select v from t where case when w > 25 then v > 0 "
            "else v < 0 end"
        )
        keep = np.where(df.w > 25, df.v > 0, df.v < 0)
        np.testing.assert_array_equal(out["v"], df.v[keep])


class TestAbs:
    def test_abs_int(self, ctx):
        c, df = ctx
        out = c.sql_df("select abs(v) as a from t")
        np.testing.assert_array_equal(out["a"], np.abs(df.v))

    def test_abs_float(self, rng):
        f = (rng.standard_normal(200) * 10).astype(np.float32)
        c = Context()
        c.create_table("t", pd.DataFrame({"f": f}))
        out = c.sql_df("select abs(f) as a from t")
        np.testing.assert_allclose(out["a"], np.abs(f), rtol=1e-6)

    def test_abs_in_agg_and_where(self, ctx):
        c, df = ctx
        out = c.sql_df(
            "select k, sum(abs(v)) as s from t where abs(v) > 10 "
            "group by k order by k"
        )
        f = df[np.abs(df.v) > 10]
        exp = f.assign(a=np.abs(f.v)).groupby("k")["a"].sum().reset_index()
        np.testing.assert_array_equal(out["k"], exp["k"])
        np.testing.assert_array_equal(out["s"], exp["a"])


class TestKeywordHygiene:
    def test_union_and_all_are_reserved_with_grammar(self):
        """'union'/'all' are reserved keywords now that UNION is actually
        implemented (they were temporarily freed in round 2 while no grammar
        consumed them — keywords must only be reserved by real grammar)."""
        from harkdb_tpu.sql.parser import SqlError

        c = Context()
        c.create_table("t", pd.DataFrame({"v": np.array([1, 2], np.int32)}))
        with pytest.raises(SqlError):
            c.sql_df("select union from t")
        # ... and the grammar that reserves them works:
        out = c.sql_df("select v from t union all select v from t")
        assert len(out) == 4


class TestOrderByAlias:
    def test_order_by_select_alias(self, ctx):
        c, df = ctx
        out = c.sql_df(
            "select k, sum(v) as s from t group by k order by s desc"
        )
        exp = (df.groupby("k")["v"].sum().reset_index()
               .sort_values("v", ascending=False, kind="stable"))
        np.testing.assert_array_equal(out["s"], exp["v"])

    def test_real_column_wins_over_alias(self, ctx):
        """A bare ORDER BY identifier that IS a table column must keep
        resolving to the column even when an alias shadows it."""
        c, df = ctx
        # "w" is a real column AND an alias of v; "x" only an alias of w.
        # So the sort keys are (column w, column w) — i.e. by w, stable.
        out = c.sql_df("select v as w, w as x from t order by w, x")
        exp = df.sort_values("w", kind="stable")
        np.testing.assert_array_equal(out["w"], exp["v"])
        np.testing.assert_array_equal(out["x"], exp["w"])

    def test_unknown_still_raises(self, ctx):
        c, _df = ctx
        from harkdb_tpu.plan.planner import PlanError
        with pytest.raises(PlanError):
            c.sql("select v from t order by nosuch")


class TestScalarFuncs:
    """floor/ceil/round/sqrt (engine extensions; identity on ints for the
    rounding trio, sqrt always promotes to float)."""

    def test_rounding_on_floats(self, rng):
        f = (rng.standard_normal(200) * 10).astype(np.float32)
        c = Context()
        c.create_table("t", pd.DataFrame({"f": f}))
        out = c.sql_df(
            "select floor(f) as fl, ceil(f) as ce, round(f) as ro from t"
        )
        np.testing.assert_allclose(out["fl"], np.floor(f), rtol=1e-6)
        np.testing.assert_allclose(out["ce"], np.ceil(f), rtol=1e-6)
        # SQL ROUND: half away from zero, not numpy's banker's rounding
        np.testing.assert_allclose(
            out["ro"], np.sign(f) * np.floor(np.abs(f) + 0.5), rtol=1e-6
        )

    def test_round_half_away_from_zero(self):
        c = Context()
        c.create_table("t", pd.DataFrame(
            {"f": np.array([2.5, -2.5, 3.5, -0.5, 0.5], np.float32)}
        ))
        out = c.sql_df("select round(f) as r from t")
        assert out["r"].tolist() == [3.0, -3.0, 4.0, -1.0, 1.0]

    def test_rounding_identity_on_ints(self, ctx):
        c, df = ctx
        out = c.sql_df("select floor(v) as a, ceil(v) as b from t")
        np.testing.assert_array_equal(out["a"], df.v)
        np.testing.assert_array_equal(out["b"], df.v)

    def test_sqrt(self, ctx):
        c, df = ctx
        out = c.sql_df("select sqrt(abs(v)) as s from t")
        np.testing.assert_allclose(
            out["s"], np.sqrt(np.abs(df.v)), rtol=1e-6
        )

    def test_sqrt_in_predicate(self, ctx):
        c, df = ctx
        out = c.sql_df("select v from t where sqrt(abs(v)) > 5")
        np.testing.assert_array_equal(
            out["v"], df.v[np.sqrt(np.abs(df.v)) > 5]
        )

    def test_on_strings_rejected(self):
        from harkdb_tpu.plan.planner import PlanError

        c = Context()
        c.create_table("s", pd.DataFrame({"x": ["a", "b"]}))
        for fn in ["floor", "ceil", "round", "sqrt"]:
            with pytest.raises(PlanError):
                c.sql_df(f"select {fn}(x) from s")
