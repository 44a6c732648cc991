"""EXISTS / NOT EXISTS and large IN (SELECT ...) sets (round-4 extension;
closes the last SQL-surface edge from the r3 verdict).

Lowering under test (``plan/planner.py _rewrite_exists`` + the LUT branch
of ``_resolve_subqueries``): a single correlated column equality becomes
the semi-join form ``outer IN (SELECT inner ...)``; uncorrelated EXISTS
becomes ``(SELECT count(*) ...) > offset``; IN sets beyond 1024 distinct
values lower to a boolean-LUT membership gather (bounded-span ints, or
bits over the outer column's dictionary for strings) instead of raising.
Also pins the empty-input ungrouped-aggregate fix: one zero row, not zero
rows (SQL semantics), single-chip and distributed.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError


@pytest.fixture
def ectx(rng):
    c = Context()
    t = pd.DataFrame({
        "k": rng.integers(0, 3000, 4000).astype(np.int32),
        "v": rng.integers(-50, 50, 4000).astype(np.int32),
    })
    r = pd.DataFrame({
        "j": rng.integers(0, 3000, 3500).astype(np.int32),
        "w": rng.integers(0, 100, 3500).astype(np.int32),
    })
    c.create_table("t", t)
    c.create_table("r", r)
    return c, t, r


class TestExists:
    def test_correlated_semi_join(self, ectx):
        c, t, r = ectx
        got = c.sql_df(
            "select count(*) as n from t where exists "
            "(select 1 from r where r.j = t.k and r.w > 50)"
        )
        keys = set(r[r.w > 50].j.tolist())
        assert got["n"].tolist() == [int(t.k.isin(keys).sum())]

    def test_not_exists_anti_join(self, ectx):
        c, t, r = ectx
        got = c.sql_df(
            "select count(*) as n from t where not exists "
            "(select 1 from r where r.j = t.k)"
        )
        assert got["n"].tolist() == [
            int((~t.k.isin(set(r.j.tolist()))).sum())
        ]

    def test_correlation_side_order_irrelevant(self, ectx):
        c, t, r = ectx
        a = c.sql_df("select count(*) as n from t where exists "
                     "(select 1 from r where r.j = t.k)")
        b = c.sql_df("select count(*) as n from t where exists "
                     "(select 1 from r where t.k = r.j)")
        assert a["n"].tolist() == b["n"].tolist()

    def test_uncorrelated_true_false(self, ectx):
        c, t, _r = ectx
        assert len(c.sql_df(
            "select k from t where exists (select 1 from r where w >= 0) "
            "limit 3"
        )) == 3
        assert len(c.sql_df(
            "select k from t where exists (select 1 from r where w > 1000)"
        )) == 0

    def test_exists_in_boolean_combination(self, ectx):
        c, t, r = ectx
        got = c.sql_df(
            "select count(*) as n from t where v > 0 and exists "
            "(select 1 from r where r.j = t.k)"
        )
        keys = set(r.j.tolist())
        assert got["n"].tolist() == [
            int(((t.v > 0) & t.k.isin(keys)).sum())
        ]

    def test_beyond_single_equality_rejected(self, ectx):
        c, _t, _r = ectx
        with pytest.raises(PlanError, match="correlated"):
            c.sql("select k from t where exists "
                  "(select 1 from r where r.j = t.k and r.w > t.v)")

    def test_exists_outside_where_rejected(self, ectx):
        c, _t, _r = ectx
        with pytest.raises(PlanError, match="WHERE and HAVING"):
            c.sql("select exists (select 1 from r) from t")

    def test_distributed_parity(self, ectx, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        c, t, r = ectx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", t)
        cm.create_table("r", r)
        for q in [
            "select count(*) as n from t where exists "
            "(select 1 from r where r.j = t.k)",
            "select k, v from t where not exists "
            "(select 1 from r where r.j = t.k and r.w > 80) "
            "order by k, v limit 40",
        ]:
            pd.testing.assert_frame_equal(c.sql_df(q), cm.sql_df(q))


class TestBigInSets:
    def test_int_lut_membership(self, ectx):
        # > 1024 distinct values used to raise; now a boolean-LUT gather
        c, t, r = ectx
        assert r.j.nunique() > 1024
        got = c.sql_df(
            "select count(*) as n from t where k in (select j from r)"
        )
        exp = int(t.k.isin(set(r.j.tolist())).sum())
        assert got["n"].tolist() == [exp]
        got2 = c.sql_df(
            "select count(*) as n from t where k not in (select j from r)"
        )
        assert got2["n"].tolist() == [len(t) - exp]

    def test_lut_guard_bits_out_of_range(self, rng):
        # probe values OUTSIDE the LUT's [min, max] span must be False —
        # the evaluator's clip would otherwise alias the boundary bits
        c = Context()
        big = pd.DataFrame({
            "j": (np.arange(2000, dtype=np.int32) * 2 + 100)  # all even+100
        })
        probe = pd.DataFrame({
            "x": np.array([0, 99, 100, 101, 4097, 4098, 5000, 9999],
                          np.int32)
        })
        c.create_table("big", big)
        c.create_table("p", probe)
        got = c.sql_df("select x from p where x in (select j from big) "
                       "order by x")
        exp = sorted(set(probe.x) & set(big.j))
        assert got["x"].tolist() == exp

    def test_string_lut_membership(self, rng):
        c = Context()
        s1 = pd.DataFrame(
            {"s": [f"id{i:05d}" for i in rng.integers(0, 3000, 5000)]}
        )
        s2 = pd.DataFrame(
            {"s": [f"id{i:05d}" for i in rng.integers(0, 2000, 4000)]}
        )
        assert s2.s.nunique() > 1024
        c.create_table("s1", s1)
        c.create_table("s2", s2)
        got = c.sql_df(
            "select count(*) as n from s1 where s in (select s from s2)"
        )
        assert got["n"].tolist() == [
            int(s1.s.isin(set(s2.s.tolist())).sum())
        ]


class TestEmptyAggregateSingleton:
    def test_single_chip(self, ectx):
        c, _t, _r = ectx
        got = c.sql_df(
            "select count(*) as n, sum(v) as s, max(v) as m, avg(v) as a "
            "from t where v > 999"
        )
        assert got["n"].tolist() == [0]
        # SQL: SUM/MAX/AVG over empty input are NULL (round 5); COUNT is 0
        assert got["s"].isna().tolist() == [True]
        assert got["m"].isna().tolist() == [True]
        assert got["a"].isna().tolist() == [True]
        # the raw matrix shows the 0-fill, not the op-neutral extreme
        raw = c.sql(
            "select count(*) as n, sum(v) as s, max(v) as m from t "
            "where v > 999"
        )
        assert raw.tolist() == [[0, 0, 0]]

    def test_distributed(self, ectx):
        from harkdb_tpu.parallel import make_engine_mesh

        c, t, _r = ectx
        cm = Context(mesh=make_engine_mesh(8))
        cm.create_table("t", t)
        got = cm.sql_df(
            "select count(*) as n, sum(v) as s, min(v) as m "
            "from t where v > 999"
        )
        assert got["n"].tolist() == [0]
        assert got["s"].isna().tolist() == [True]
        assert got["m"].isna().tolist() == [True]

    def test_nonempty_unchanged(self, ectx):
        c, t, _r = ectx
        got = c.sql_df("select count(*) as n, min(v) as m from t")
        assert got["n"].tolist() == [len(t)]
        assert got["m"].tolist() == [int(t.v.min())]
