"""LEFT-JOIN NULL semantics (round-4 verdict item 2).

The engine's storage model has no NULLs (homogeneous numeric columns, like
the reference's tables) — but LEFT JOIN produces rows SQL would fill with
NULL. Implementation under test: each LEFT join emits a hidden 0/1 matched
flag (``ops/join.py matched_out``); the planner lowers ``IS [NOT] NULL`` to
flag tests, masks aggregates over nullable columns (CASE on the flag fused
into the groupby sort), groups NULL keys separately (flag as a secondary
group key), and ``sql_df`` decodes unmatched cells to NaN (numeric) / None
(string) through trailing ``#nullflag`` columns. ``sql`` keeps the raw
0-filled matrix (reference-shaped output).
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError   # noqa: F401  (API parity)


@pytest.fixture
def nctx():
    c = Context()
    c.create_table("a", pd.DataFrame({
        "k": np.array([1, 2, 3, 4], np.int32),
        "v": np.array([10, 20, 30, 40], np.int32),
    }))
    c.create_table("r", pd.DataFrame({
        "k": np.array([1, 1, 3], np.int32),
        "w": np.array([5, 6, 7], np.int32),
        "s": ["x", "y", "z"],
    }))
    return c


@pytest.fixture
def big(rng):
    nl, nr = 400, 150
    ldf = pd.DataFrame({
        "k": rng.integers(0, 60, nl).astype(np.int32),
        "v": rng.integers(-30, 30, nl).astype(np.int32),
    })
    rdf = pd.DataFrame({
        "j": rng.integers(0, 40, nr).astype(np.int32),   # keys 40-59 unmatched
        "w": rng.integers(1, 100, nr).astype(np.int32),
    })
    return ldf, rdf


class TestSqlDfDecode:
    def test_numeric_nan_string_none(self, nctx):
        df = nctx.sql_df(
            "select a.k, r.w, r.s from a left join r on a.k = r.k "
            "order by a.k, r.w"
        )
        # rows: k=1(w=5), k=1(w=6), k=2(NULL), k=3(w=7), k=4(NULL)
        assert df["w"].tolist()[:2] == [5.0, 6.0] and df["w"][3] == 7.0
        assert df["w"].isna().tolist() == [False, False, True, False, True]
        assert df["s"].tolist()[:2] == ["x", "y"] and df["s"][3] == "z"
        # decoded to None host-side; pandas' Arrow-string dtype surfaces
        # missing as NaN — isna() is the portable check
        assert df["s"].isna().tolist() == [False, False, True, False, True]
        # raw matrix keeps the 0-fill
        raw = nctx.sql(
            "select a.k, r.w from a left join r on a.k = r.k "
            "order by a.k, r.w"
        )
        assert raw[2, 1] == 0 and raw[4, 1] == 0

    def test_expression_over_nullable_is_nan(self, nctx):
        df = nctx.sql_df(
            "select a.k, r.w + 1 as w1 from a left join r on a.k = r.k "
            "order by a.k, r.w"
        )
        assert df["w1"].isna().tolist() == [False, False, True, False, True]

    def test_left_columns_never_null(self, nctx):
        df = nctx.sql_df(
            "select a.v from a left join r on a.k = r.k order by a.k, r.w"
        )
        assert not df["v"].isna().any()
        assert df["v"].dtype.kind == "i"      # no float upcast


class TestIsNull:
    def test_where_is_null(self, nctx):
        df = nctx.sql_df(
            "select a.k from a left join r on a.k = r.k "
            "where r.w is null order by a.k"
        )
        assert df["k"].tolist() == [2, 4]

    def test_where_is_not_null(self, nctx):
        df = nctx.sql_df(
            "select a.k from a left join r on a.k = r.k "
            "where r.w is not null order by a.k, r.w"
        )
        assert df["k"].tolist() == [1, 1, 3]

    def test_select_is_null_expr(self, nctx):
        df = nctx.sql_df(
            "select a.k, r.s is null as miss from a left join r "
            "on a.k = r.k order by a.k, r.w"
        )
        assert df["miss"].astype(bool).tolist() == [
            False, False, True, False, True
        ]

    def test_is_null_on_non_nullable_is_false(self, nctx):
        df = nctx.sql_df("select k from a where k is null")
        assert len(df) == 0
        df = nctx.sql_df("select k from a where k is not null")
        assert len(df) == 4


class TestAggregateSkip:
    """Aggregates over nullable right columns skip unmatched rows, matching
    pandas (which nulls correctly). All-unmatched groups are NULL for
    sum/avg/min/max/prod (SQL semantics, round 5) and 0 for COUNT."""

    def test_sum_count_avg_vs_pandas(self, big):
        ldf, rdf = big
        c = Context()
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        got = c.sql_df(
            "select l.k, count(r.w) as c, sum(r.w) as s, avg(r.w) as av, "
            "count(*) as n from l left join r on l.k = r.j "
            "group by l.k order by l.k"
        )
        m = ldf.merge(rdf, left_on="k", right_on="j", how="left")
        g = m.groupby("k").agg(
            c=("w", "count"),
            s=pd.NamedAgg("w", lambda x: x.sum(min_count=1)),  # SQL: NULL
            n=("w", "size"),
        ).reset_index()
        assert got["k"].tolist() == g["k"].tolist()
        assert got["c"].tolist() == g["c"].tolist()
        np.testing.assert_array_equal(got["s"].to_numpy(),
                                      g["s"].to_numpy(np.float64))
        assert got["n"].tolist() == g["n"].tolist()   # count(*) counts all
        av = m.groupby("k")["w"].mean()               # all-NaN group → NaN
        np.testing.assert_allclose(got["av"], av.to_numpy(), rtol=1e-6)

    def test_min_max_skip_unmatched(self, big):
        ldf, rdf = big
        c = Context()
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        got = c.sql_df(
            "select l.k, min(r.w) as mn, max(r.w) as mx from l "
            "left join r on l.k = r.j group by l.k order by l.k"
        )
        m = ldf.merge(rdf, left_on="k", right_on="j", how="left")
        g = m.groupby("k")["w"]
        np.testing.assert_array_equal(got["mn"].to_numpy(),
                                      g.min().to_numpy(np.float64))
        np.testing.assert_array_equal(got["mx"].to_numpy(),
                                      g.max().to_numpy(np.float64))
        # the raw matrix shows 0 in NULL cells, not the neutral extreme
        raw = c.sql(
            "select l.k, min(r.w) as mn from l left join r on l.k = r.j "
            "group by l.k order by l.k"
        )
        nulls = g.min().isna().to_numpy()
        assert (raw[nulls, 1] == 0).all()

    def test_count_distinct_skips_unmatched(self, nctx):
        got = nctx.sql_df(
            "select a.k, count(distinct r.w) as cd from a "
            "left join r on a.k = r.k group by a.k order by a.k"
        )
        assert got["cd"].tolist() == [2, 0, 1, 0]

    def test_count_distinct_no_sentinel_collision(self):
        # the round-4 implementation used INT32_MIN as the NULL sentinel —
        # a REAL INT32_MIN value then miscounted (documented sharp edge);
        # round 5 carries the validity as an extra sort key instead
        lo = -(1 << 31)
        c = Context()
        c.create_table("l", pd.DataFrame({
            "k": np.array([1, 1, 2], np.int32)}))
        c.create_table("r", pd.DataFrame({
            "j": np.array([1, 1], np.int32),
            "w": np.array([lo, lo], np.int32),
        }))
        got = c.sql_df(
            "select l.k, count(distinct r.w) as cd from l "
            "left join r on l.k = r.j group by l.k order by l.k"
        )
        assert got["cd"].tolist() == [1, 0]

    def test_prod_all_unmatched_is_null(self, nctx):
        got = nctx.sql_df(
            "select a.k, prod(r.w) as p from a left join r on a.k = r.k "
            "group by a.k order by a.k"
        )
        np.testing.assert_array_equal(
            got["p"].to_numpy(), [30.0, np.nan, 7.0, np.nan]
        )

    def test_ungrouped_aggregate_skips(self, nctx):
        got = nctx.sql_df(
            "select sum(r.w) as s, count(r.w) as c, count(*) as n "
            "from a left join r on a.k = r.k"
        )
        assert got["s"].tolist() == [18]
        assert got["c"].tolist() == [3]
        assert got["n"].tolist() == [5]


class TestNullOrdering:
    """ORDER BY over nullable columns: SQL defaults (NULLS LAST for ASC,
    FIRST for DESC — NULL sorts as larger than any value) with explicit
    NULLS FIRST/LAST overrides. The NULL end is folded into the sort key
    (dtype extreme on unmatched rows), so the distributed range partition
    works unchanged."""

    def test_defaults(self, nctx):
        d1 = nctx.sql_df("select a.k, r.w from a left join r on a.k = r.k "
                         "order by r.w, a.k")
        assert d1["k"].tolist() == [1, 1, 3, 2, 4]       # nulls last
        d2 = nctx.sql_df("select a.k, r.w from a left join r on a.k = r.k "
                         "order by r.w desc, a.k")
        assert d2["k"].tolist() == [2, 4, 3, 1, 1]       # nulls first

    def test_explicit_overrides(self, nctx):
        d3 = nctx.sql_df("select a.k, r.w from a left join r on a.k = r.k "
                         "order by r.w nulls first, a.k")
        assert d3["k"].tolist() == [2, 4, 1, 1, 3]
        d4 = nctx.sql_df("select a.k, r.w from a left join r on a.k = r.k "
                         "order by r.w desc nulls last, a.k")
        assert d4["k"].tolist() == [3, 1, 1, 2, 4]

    def test_coalesce_key_not_null_ordered(self, nctx):
        # coalesce strips nullability → the default takes part in the
        # normal value order instead of sorting to the NULL end
        d = nctx.sql_df(
            "select a.k, coalesce(r.w, 6) as cw from a "
            "left join r on a.k = r.k order by cw, a.k"
        )
        assert d["cw"].tolist() == [5, 6, 6, 6, 7]

    def test_distributed_parity(self, nctx, big):
        from harkdb_tpu.parallel import make_engine_mesh

        ldf, rdf = big
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        for q in [
            "select l.k, l.v, r.w from l left join r on l.k = r.j "
            "order by r.w, l.k, l.v limit 60",
            "select l.k, l.v, r.w from l left join r on l.k = r.j "
            "order by r.w desc nulls last, l.k, l.v limit 60",
            "select distinct r.w from l left join r on l.k = r.j "
            "order by r.w nulls first",
        ]:
            pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))

    def test_rejected_in_over(self, nctx):
        from harkdb_tpu.sql.parser import SqlError

        with pytest.raises(SqlError, match="OVER"):
            nctx.sql("select sum(v) over (order by v nulls first) from a")

    def test_union_null_ordering(self, nctx):
        # round 5: NULL indicators ride the union tail, so NULLS FIRST
        # works across arms (arm 2's unmatched rows are the NULLs)
        df = nctx.sql_df(
            "select r.w from a join r on a.k = r.k "
            "union all select r.w from a left join r on a.k = r.k "
            "order by w nulls first, w"
        )
        assert df["w"].isna().tolist()[:2] == [True, True]
        assert df["w"].dropna().tolist() == sorted(df["w"].dropna())


class TestCoalesceAndCast:
    def test_coalesce_default_on_unmatched(self, nctx):
        df = nctx.sql_df(
            "select a.k, coalesce(r.w, -1) as w from a "
            "left join r on a.k = r.k order by a.k, r.w"
        )
        assert df["w"].tolist() == [5, 6, -1, 7, -1]
        # coalesce strips nullability: no NaN decode, int dtype preserved
        assert df["w"].dtype.kind == "i"

    def test_coalesce_through_aggregates(self, nctx):
        # SQL: coalesce(r.w, 100) is never NULL, so unmatched rows
        # CONTRIBUTE the default (the nullable-skip rewrite must not mask)
        got = nctx.sql_df(
            "select a.k, sum(coalesce(r.w, 100)) as s, "
            "count(coalesce(r.w, 0)) as c from a "
            "left join r on a.k = r.k group by a.k order by a.k"
        )
        assert got["s"].tolist() == [11, 100, 7, 100]
        assert got["c"].tolist() == [2, 1, 1, 1]

    def test_coalesce_chain_two_nullables(self, nctx):
        c = nctx
        import pandas as pd

        c.create_table("r2", pd.DataFrame({
            "k": np.array([2], np.int32), "u": np.array([99], np.int32),
        }))
        got = c.sql_df(
            "select a.k, coalesce(r.w, r2.u, 0) as x from a "
            "left join r on a.k = r.k left join r2 on a.k = r2.k "
            "order by a.k, r.w"
        )
        assert got["x"].tolist() == [5, 6, 99, 7, 0]

    def test_coalesce_in_where(self, nctx):
        got = nctx.sql_df(
            "select a.k from a left join r on a.k = r.k "
            "where coalesce(r.w, 0) = 0 order by a.k"
        )
        assert got["k"].tolist() == [2, 4]

    def test_coalesce_string_rejected(self, nctx):
        with pytest.raises(PlanError, match="COALESCE over string"):
            nctx.sql("select coalesce(r.s, r.s) from a "
                     "left join r on a.k = r.k")

    def test_cast(self, nctx):
        got = nctx.sql_df(
            "select cast(a.v as float) / 3 as h, "
            "cast(a.v / 3 as int) as i from a order by a.k"
        )
        np.testing.assert_allclose(
            got["h"], np.array([10, 20, 30, 40]) / 3, rtol=1e-6
        )
        assert got["i"].tolist() == [3, 6, 10, 13]

    def test_case_is_not_null_guard_not_masked(self, nctx):
        # the explicit IS NOT NULL guard pattern must also strip
        # nullability from the guarded branch (asserted-flag analysis)
        got = nctx.sql_df(
            "select a.k, sum(case when r.w is not null then r.w else -5 "
            "end) as s from a left join r on a.k = r.k "
            "group by a.k order by a.k"
        )
        assert got["s"].tolist() == [11, -5, 7, -5]


class TestNullGroup:
    def test_null_key_is_its_own_group(self):
        c = Context()
        c.create_table("a", pd.DataFrame({
            "k": np.array([0, 1, 2], np.int32),
            "v": np.array([10, 20, 30], np.int32),
        }))
        # right key 0 exists, so the real value-0 group must NOT absorb the
        # unmatched (NULL-key) rows
        c.create_table("r", pd.DataFrame({
            "k": np.array([0, 1], np.int32),
            "g": np.array([0, 7], np.int32),
        }))
        got = c.sql_df(
            "select r.g, count(*) as n from a left join r on a.k = r.k "
            "group by r.g order by r.g"
        )
        # groups: g=0 (matched), g=NULL (unmatched, k=2), g=7 (matched).
        # NULL group sorts with value 0 but its flag separates it; sql_df
        # decodes the NULL group's key to NaN.
        assert len(got) == 3
        nulls = got["g"].isna()
        assert nulls.sum() == 1
        assert got.loc[nulls, "n"].tolist() == [1]
        real = got[~nulls].sort_values("g")
        assert real["g"].tolist() == [0.0, 7.0]
        assert real["n"].tolist() == [1, 1]


class TestDistributedNulls:
    QUERIES = [
        "select l.k, r.w, r.w is null as m from l left join r on l.k = r.j "
        "order by l.k, l.v, r.w",
        "select l.k from l left join r on l.k = r.j where r.w is null "
        "order by l.k, l.v",
        "select l.k, count(r.w) as c, sum(r.w) as s, min(r.w) as mn "
        "from l left join r on l.k = r.j group by l.k order by l.k",
        "select distinct r.w from l left join r on l.k = r.j order by r.w",
    ]

    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_matches_single_chip(self, big, qi):
        from harkdb_tpu.parallel import make_engine_mesh

        ldf, rdf = big
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        q = self.QUERIES[qi]
        pd.testing.assert_frame_equal(
            cs.sql_df(q), cm.sql_df(q), check_dtype=False
        )
