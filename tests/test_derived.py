"""Derived tables — FROM (SELECT ...) alias (engine extension; the
reference grammar is single-named-table only, ``parse.py:29-33``).

Implementation under test (``plan/derived.py``): the inner SELECT plans at
plan time (errors surface early) and materializes lazily at first
execution, cached on the plan; string dictionaries carry through; joins to
base tables work; distributed contexts run the inner query through the
full distributed path and reshard its (small) result.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError
from harkdb_tpu.sql.parser import SqlError


@pytest.fixture
def dctx(rng):
    c = Context()
    df = pd.DataFrame({
        "k": rng.integers(0, 12, 400).astype(np.int32),
        "v": rng.integers(-50, 50, 400).astype(np.int32),
        "s": rng.choice(["ant", "bee", "cat", "elk"], 400),
    })
    c.create_table("t", df)
    c.create_table("dim", pd.DataFrame({
        "j": np.arange(12, dtype=np.int32),
        "m": rng.integers(1, 9, 12).astype(np.int32),
    }))
    return c, df


class TestDerivedBasics:
    def test_aggregate_then_filter(self, dctx):
        c, df = dctx
        out = c.sql_df(
            "select d.k, d.tot from (select k, sum(v) as tot from t "
            "group by k) d where d.tot > 0 order by d.tot desc, d.k"
        )
        g = df.groupby("k", as_index=False).agg(tot=("v", "sum"))
        g = g[g.tot > 0].sort_values(["tot", "k"], ascending=[False, True])
        assert out["k"].tolist() == g["k"].tolist()
        assert out["tot"].tolist() == g["tot"].tolist()

    def test_regroup_over_derived(self, dctx):
        # aggregate over an aggregate — impossible without derived tables
        c, df = dctx
        out = c.sql_df(
            "select count(*) as n, sum(d.tot) as s from "
            "(select k, sum(v) as tot from t group by k) d "
            "where d.tot > 0"
        )
        g = df.groupby("k").v.sum()
        g = g[g > 0]
        assert out["n"].tolist() == [len(g)]
        assert out["s"].tolist() == [int(g.sum())]

    def test_projection_and_where_inside(self, dctx):
        c, df = dctx
        out = c.sql_df(
            "select u.v + 1 as w from (select v from t where v > 40) u "
            "order by w"
        )
        exp = np.sort(df[df.v > 40].v.to_numpy()) + 1
        assert out["w"].tolist() == exp.tolist()

    def test_inner_order_limit(self, dctx):
        # top-k inside the derived table, re-ordered outside
        c, df = dctx
        out = c.sql_df(
            "select u.v from (select v from t order by v desc limit 5) u "
            "order by u.v"
        )
        exp = np.sort(df.v.to_numpy())[-5:]
        assert out["v"].tolist() == exp.tolist()

    def test_strings_carry_dictionaries(self, dctx):
        c, df = dctx
        out = c.sql_df(
            "select u.s, count(*) as n from "
            "(select s, v from t where v > 0) u "
            "where u.s like '%e%' group by u.s order by u.s"
        )
        w = df[(df.v > 0) & df.s.str.contains("e")].groupby("s").size()
        assert out["s"].tolist() == list(w.index)
        assert out["n"].tolist() == w.tolist()

    def test_join_derived_to_base(self, dctx):
        c, df = dctx
        out = c.sql_df(
            "select d.k, d.tot, dim.m from "
            "(select k, sum(v) as tot from t group by k) d "
            "join dim on d.k = dim.j order by d.k"
        )
        assert len(out) == df.k.nunique()
        g = df.groupby("k").v.sum()
        assert out["tot"].tolist() == g.tolist()

    def test_windows_inside_derived(self, dctx):
        c, df = dctx
        out = c.sql_df(
            "select d.k, d.rn from (select k, v, row_number() over "
            "(partition by k order by v desc) as rn from t) d "
            "where d.rn = 1 order by d.k"
        )
        assert out["k"].tolist() == sorted(df.k.unique().tolist())

    def test_repeated_execution_uses_cache(self, dctx):
        c, _df = dctx
        q = ("select count(*) as n from "
             "(select k from t where v > 0) d")
        a = c.sql_df(q)
        b = c.sql_df(q)
        assert a["n"].tolist() == b["n"].tolist()


class TestDerivedErrors:
    def test_alias_required(self, dctx):
        c, _df = dctx
        with pytest.raises(SqlError, match="alias"):
            c.sql("select k from (select k from t)")

    def test_unknown_column_in_outer(self, dctx):
        c, _df = dctx
        with pytest.raises(PlanError):
            c.sql("select d.nope from (select k from t) d")

    def test_duplicate_output_names_rejected(self, dctx):
        c, _df = dctx
        with pytest.raises(PlanError, match="unique"):
            c.sql("select d.k from (select k, k from t) d")

    def test_inner_unknown_table(self, dctx):
        c, _df = dctx
        with pytest.raises(Exception, match="is not in tables"):
            c.sql("select d.k from (select k from nope) d")


class TestDerivedDistributed:
    QUERIES = [
        "select d.k, d.tot from (select k, sum(v) as tot from t "
        "group by k) d where d.tot > 0 order by d.tot desc, d.k",
        "select d.k, d.tot, dim.m from (select k, sum(v) as tot from t "
        "group by k) d join dim on d.k = dim.j order by d.k",
        "select u.s, count(*) as n from (select s, v from t "
        "where v > 0) u group by u.s order by u.s",
    ]

    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_matches_single_chip(self, dctx, qi, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        cs, df = dctx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", df)
        cm.create_table("dim", pd.DataFrame({
            "j": np.arange(12, dtype=np.int32),
            "m": np.asarray(cs.tables["dim"].host_columns["m"]),
        }))
        q = self.QUERIES[qi]
        pd.testing.assert_frame_equal(
            cs.sql_df(q), cm.sql_df(q), check_dtype=False
        )
