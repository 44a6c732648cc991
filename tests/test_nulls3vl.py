"""SQL three-valued logic and NULL result semantics (round-5 verdict
items 1-2).

Under test (``plan/nulls.py``):

  * WHERE/HAVING predicates over nullable (outer-join) columns follow
    Kleene 3VL: a comparison with a NULL operand is UNKNOWN, NOT UNKNOWN
    stays UNKNOWN, OR/AND combine per Kleene, and only TRUE keeps a row —
    the round-4 verdict's live-reproduced silent wrong answer
    (``LEFT JOIN ... WHERE d.m < 100`` returning unmatched rows).
  * CASE conditions are 3VL too: an UNKNOWN condition selects no branch.
  * SUM/AVG/MIN/MAX/PROD of a group with no non-NULL input are NULL
    (COUNT is 0); same for ungrouped aggregates over empty input.
  * A nullable column used as a later JOIN key matches nothing (NULL =
    NULL is not a match) — implemented via the nullcode sort operand in
    ``ops/join.py``, no sentinel values.
  * UNION carries NULL indicators across arms; NULLs compare EQUAL in the
    set-op dedupe (one canonical NULL row).

Every case is differentially checked against pandas (which implements the
same NULL semantics via NaN).
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.errors import PlanError


@pytest.fixture
def tctx():
    c = Context()
    c.create_table("f", pd.DataFrame({
        "k": np.array([1, 2, 3, 4], np.int32),
        "x": np.array([10, 20, 30, 40], np.int32),
    }))
    c.create_table("d", pd.DataFrame({
        "j": np.array([1, 2, 2], np.int32),
        "m": np.array([5, 150, 7], np.int32),
    }))
    return c


@pytest.fixture
def big(rng):
    nl, nr = 500, 200
    ldf = pd.DataFrame({
        "k": rng.integers(0, 80, nl).astype(np.int32),
        "x": rng.integers(-50, 50, nl).astype(np.int32),
    })
    rdf = pd.DataFrame({
        "j": rng.integers(0, 50, nr).astype(np.int32),  # 50-79 unmatched
        "m": rng.integers(-100, 100, nr).astype(np.int32),
    })
    return ldf, rdf


def merged(ldf, rdf):
    return ldf.merge(rdf, left_on="k", right_on="j", how="left")


class TestWhere3VL:
    """The flagship fix: NULL predicates reject rows (UNKNOWN ≠ TRUE)."""

    def test_verdict_repro(self, tctx):
        # round-4 verdict: this returned ALL rows (0-fill passed `< 100`)
        df = tctx.sql_df(
            "select f.k from f left join d on f.k = d.j where d.m < 100"
        )
        assert df["k"].tolist() == [1, 2]

    def test_not_unknown_is_unknown(self, tctx):
        df = tctx.sql_df(
            "select f.k from f left join d on f.k = d.j "
            "where not (d.m < 100)"
        )
        assert df["k"].tolist() == [2]          # only m=150; NULLs rejected

    def test_or_and_kleene(self, tctx):
        df = tctx.sql_df(
            "select f.k from f left join d on f.k = d.j "
            "where d.m < 100 or f.x = 40"
        )
        assert df["k"].tolist() == [1, 2, 4]    # UNKNOWN OR TRUE = TRUE
        df = tctx.sql_df(
            "select f.k from f left join d on f.k = d.j "
            "where not (d.m < 100 and f.x = 40)"
        )
        # k=1: m=5<100 and x≠40 → and=F → not=T; k=2 both rows: F→T;
        # k=3,4: UNKNOWN and F = F → not = T... except k=4 has x=40:
        # UNKNOWN and TRUE = UNKNOWN → rejected
        assert df["k"].tolist() == [1, 2, 2, 3]

    def test_differential_vs_pandas(self, big):
        ldf, rdf = big
        c = Context()
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        m = merged(ldf, rdf)
        cases = [
            ("r.m > 0", m["m"] > 0),
            ("not (r.m > 0)", m["m"].notna() & ~(m["m"] > 0)),
            ("r.m > 0 or l.x < 0", (m["m"] > 0) | (m["x"] < 0)),
            ("r.m > 0 and l.x < 0", (m["m"] > 0) & (m["x"] < 0)),
            ("not (r.m > 0 or l.x < 0)",
             m["m"].notna() & ~(m["m"] > 0) & ~(m["x"] < 0)),
            ("r.m + l.x > 10", (m["m"] + m["x"]) > 10),
            ("r.m between 0 and 50", (m["m"] >= 0) & (m["m"] <= 50)),
            ("r.m in (1, 2, 3)", m["m"].isin([1, 2, 3])),
            ("r.m is null or r.m > 50", m["m"].isna() | (m["m"] > 50)),
        ]
        for sql_pred, pd_mask in cases:
            got = c.sql_df(
                f"select l.k, l.x, r.m from l left join r on l.k = r.j "
                f"where {sql_pred} order by l.k, l.x, r.m"
            )
            want = m[pd_mask.fillna(False)].sort_values(
                ["k", "x", "m"], na_position="last"
            )
            assert got["k"].tolist() == want["k"].tolist(), sql_pred
            np.testing.assert_array_equal(
                got["m"].to_numpy(),
                want["m"].to_numpy(np.float64),
                err_msg=sql_pred,
            )

    def test_case_condition_3vl(self, tctx):
        # UNKNOWN selects no branch: unmatched rows fall through to ELSE
        df = tctx.sql_df(
            "select f.k, case when d.m > 6 then 1 when d.m <= 6 then 2 "
            "else 9 end as c from f left join d on f.k = d.j "
            "order by f.k, d.m"
        )
        # rows (k,m): (1,5) (2,7) (2,150) (3,NULL) (4,NULL)
        assert df["c"].tolist() == [2, 1, 1, 9, 9]

    def test_case_guard_makes_non_null(self, tctx):
        # a guarded CASE never selects the NULL cell → output non-NULL
        df = tctx.sql_df(
            "select f.k, case when d.m > 0 then d.m else -1 end as c "
            "from f left join d on f.k = d.j order by f.k, d.m"
        )
        assert df["c"].tolist() == [5, 7, 150, -1, -1]
        assert not df["c"].isna().any()


class TestNullAggregates:
    def test_all_null_group_is_null(self, tctx):
        df = tctx.sql_df(
            "select f.k, sum(d.m) as s, avg(d.m) as a, min(d.m) as mn, "
            "max(d.m) as mx, count(d.m) as c from f "
            "left join d on f.k = d.j group by f.k order by f.k"
        )
        for col in ("s", "a", "mn", "mx"):
            assert df[col].isna().tolist() == [False, False, True, True]
        assert df["c"].tolist() == [1, 2, 0, 0]

    def test_empty_input_ungrouped(self, tctx):
        df = tctx.sql_df(
            "select sum(x) as s, min(x) as mn, avg(x) as a, "
            "count(x) as c, count(*) as n from f where x > 999"
        )
        assert df["s"].isna().tolist() == [True]
        assert df["mn"].isna().tolist() == [True]
        assert df["a"].isna().tolist() == [True]
        assert df["c"].tolist() == [0] and df["n"].tolist() == [0]

    def test_having_over_null_aggregate(self, big):
        # HAVING avg(r.m) > 0 must reject all-NULL groups (UNKNOWN)
        ldf, rdf = big
        c = Context()
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        got = c.sql_df(
            "select l.k, avg(r.m) as a from l left join r on l.k = r.j "
            "group by l.k having avg(r.m) > 0 order by l.k"
        )
        m = merged(ldf, rdf)
        want = m.groupby("k")["m"].mean()
        want = want[want > 0]                   # NaN > 0 is False in pandas
        assert got["k"].tolist() == want.index.tolist()
        np.testing.assert_allclose(got["a"], want.to_numpy(), rtol=1e-6)

    def test_having_is_null(self, tctx):
        df = tctx.sql_df(
            "select f.k from f left join d on f.k = d.j "
            "group by f.k having sum(d.m) is null order by f.k"
        )
        assert df["k"].tolist() == [3, 4]

    def test_coalesce_over_aggregate(self, tctx):
        df = tctx.sql_df(
            "select f.k, coalesce(sum(d.m), -1) as s from f "
            "left join d on f.k = d.j group by f.k order by f.k"
        )
        assert df["s"].tolist() == [5, 157, -1, -1]
        assert not df["s"].isna().any()

    def test_order_by_null_aggregate(self, tctx):
        df = tctx.sql_df(
            "select f.k, sum(d.m) as s from f left join d on f.k = d.j "
            "group by f.k order by s, f.k"          # NULLS LAST default
        )
        assert df["k"].tolist() == [1, 2, 3, 4]
        df = tctx.sql_df(
            "select f.k, sum(d.m) as s from f left join d on f.k = d.j "
            "group by f.k order by s nulls first, f.k"
        )
        assert df["k"].tolist() == [3, 4, 1, 2]


class TestNullJoinKeys:
    def test_null_key_matches_nothing(self):
        c = Context()
        c.create_table("f", pd.DataFrame({
            "k": np.array([1, 2, 3], np.int32)}))
        c.create_table("d", pd.DataFrame({
            "j": np.array([1], np.int32),
            "m": np.array([0], np.int32),       # m=0 == the 0-fill value
        }))
        c.create_table("e", pd.DataFrame({
            "z": np.array([0, 7], np.int32),
            "w": np.array([111, 222], np.int32),
        }))
        # k=2,3 unmatched → d.m NULL; NULL must NOT match e.z = 0
        inner = c.sql_df(
            "select f.k, e.w from f left join d on f.k = d.j "
            "join e on d.m = e.z order by f.k"
        )
        assert inner["k"].tolist() == [1]
        assert inner["w"].tolist() == [111]     # the REAL m=0 still matches
        left2 = c.sql_df(
            "select f.k, e.w from f left join d on f.k = d.j "
            "left join e on d.m = e.z order by f.k"
        )
        assert left2["k"].tolist() == [1, 2, 3]
        assert left2["w"].isna().tolist() == [False, True, True]

    def test_differential_chain(self, rng):
        nf, nd, ne = 300, 120, 60
        fdf = pd.DataFrame({"k": rng.integers(0, 60, nf).astype(np.int32)})
        ddf = pd.DataFrame({
            "j": rng.integers(0, 40, nd).astype(np.int32),
            "m": rng.integers(0, 30, nd).astype(np.int32),
        })
        edf = pd.DataFrame({
            "z": rng.integers(0, 30, ne).astype(np.int32),
            "w": rng.integers(0, 9, ne).astype(np.int32),
        })
        c = Context()
        for n, df in (("f", fdf), ("d", ddf), ("e", edf)):
            c.create_table(n, df)
        got = c.sql_df(
            "select count(*) as n, count(e.w) as c, sum(e.w) as s "
            "from f left join d on f.k = d.j left join e on d.m = e.z"
        )
        m = fdf.merge(ddf, left_on="k", right_on="j", how="left").merge(
            edf, left_on="m", right_on="z", how="left"
        )
        assert got["n"].tolist() == [len(m)]
        assert got["c"].tolist() == [int(m["w"].count())]
        assert got["s"].tolist() == [m["w"].sum()]


class TestUnionNulls:
    def test_flags_ride_union_all(self, tctx):
        df = tctx.sql_df(
            "select f.k, d.m from f join d on f.k = d.j "
            "union all select f.k, d.m from f left join d on f.k = d.j "
            "order by k, m"
        )
        # arm1: 3 matched rows; arm2 adds the same 3 plus k=3,4 NULLs
        assert len(df) == 8
        assert df["m"].isna().sum() == 2

    def test_union_dedupes_nulls_as_equal(self, tctx):
        # SQL set ops treat NULLs as equal: the two arms' NULL rows (from
        # different expressions → different 0-fills) collapse to one
        df = tctx.sql_df(
            "select d.m from f left join d on f.k = d.j "
            "union select d.m + 1 from f left join d on f.k = d.j "
            "order by m"
        )
        # values {5,150,7} ∪ {6,151,8} plus ONE null row per arm... the
        # union dedupes the two arms' NULLs into ONE row
        assert df["m"].isna().sum() == 1
        assert df["m"].dropna().tolist() == [5, 6, 7, 8, 150, 151]

    def test_union_distinct_null_vs_real_zero(self):
        c = Context()
        c.create_table("f", pd.DataFrame({
            "k": np.array([1, 2], np.int32)}))
        c.create_table("d", pd.DataFrame({
            "j": np.array([1], np.int32),
            "m": np.array([0], np.int32),       # a REAL 0
        }))
        df = c.sql_df(
            "select d.m from f left join d on f.k = d.j "
            "union select d.m from f left join d on f.k = d.j "
            "order by m"
        )
        # distinct rows: the real 0 and the NULL — not merged
        assert len(df) == 2
        assert df["m"].isna().tolist() == [False, True]


class TestDistributedParity:
    def test_3vl_and_null_aggs_on_mesh(self, big):
        from harkdb_tpu.parallel import make_engine_mesh

        ldf, rdf = big
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        for q in [
            "select l.k, l.x, r.m from l left join r on l.k = r.j "
            "where not (r.m > 0) order by l.k, l.x, r.m",
            "select l.k, sum(r.m) as s, avg(r.m) as a from l "
            "left join r on l.k = r.j group by l.k "
            "having avg(r.m) > -50 order by l.k",
            "select l.k, count(distinct r.m) as cd from l "
            "left join r on l.k = r.j group by l.k order by l.k",
            "select sum(r.m) as s from l left join r on l.k = r.j "
            "where r.m > 999",
        ]:
            pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))


class TestReviewFindings:
    """Regression pins for the round-5 self-review findings (all
    reproduced before the fixes)."""

    def test_coalesce_multi_nullable_or_semantics(self):
        # finding 1: NULL iff ALL args NULL — an OR over matched
        # conditions, carried by a derived flag (plan/nulls.py NullTag)
        c = Context()
        c.create_table("a", pd.DataFrame({"k": np.int32([1, 2, 3])}))
        c.create_table("r", pd.DataFrame({
            "k": np.int32([1]), "w": np.int32([10])}))
        c.create_table("r2", pd.DataFrame({
            "k": np.int32([2]), "u": np.int32([20])}))
        base = ("from a left join r on a.k = r.k "
                "left join r2 on a.k = r2.k")
        df = c.sql_df(
            f"select a.k, coalesce(r.w, r2.u) as x {base} order by a.k"
        )
        assert df["x"].tolist()[:2] == [10.0, 20.0]
        assert df["x"].isna().tolist() == [False, False, True]
        df2 = c.sql_df(
            f"select a.k {base} where coalesce(r.w, r2.u) = 10"
        )
        assert df2["k"].tolist() == [1]
        df3 = c.sql_df(
            f"select sum(coalesce(r.w, r2.u)) as s, "
            f"count(coalesce(r.w, r2.u)) as n {base}"
        )
        assert df3["s"].tolist() == [30] and df3["n"].tolist() == [2]
        df5 = c.sql_df(
            f"select coalesce(r.w, r2.u) as g, count(*) as n {base} "
            f"group by coalesce(r.w, r2.u) order by g nulls last"
        )
        assert df5["g"].isna().tolist() == [False, False, True]

    def test_topk_never_returns_filtered_rows(self):
        # finding 2: dead rows tying the view minimum must not win top_k
        c = Context()
        c.create_table("a", pd.DataFrame({
            "k": np.int32([0, 1, 2]), "v": np.int32([100, 10, 10])}))
        c.create_table("r", pd.DataFrame({
            "k": np.int32([0, 1]), "w": np.int32([1, 5])}))
        df = c.sql_df(
            "select a.k, r.w from a left join r on a.k = r.k "
            "where a.v + coalesce(r.w, 0) < 50 order by r.w asc limit 2"
        )
        assert df["k"].tolist() == [1, 2]
        assert df["w"].isna().tolist() == [False, True]

    def test_join_total_overflow_guard(self):
        # finding 3: 65536² cross join wraps int32 to exactly 0 — must
        # raise, not return an empty result
        c = Context()
        n = 65536
        c.create_table("a", pd.DataFrame({"x": np.zeros(n, np.int32)}))
        c.create_table("b", pd.DataFrame({"y": np.zeros(n, np.int32)}))
        with pytest.raises(PlanError, match="pairs"):
            c.sql("select count(*) from a cross join b")

    def test_dist_null_key_tie_order(self):
        # finding 4: NULL-key 0-fill tying a real key 0 must not change
        # the distributed row order vs single-chip
        from harkdb_tpu.parallel import make_engine_mesh

        a = pd.DataFrame({"k": np.int32([1, 2])})
        r = pd.DataFrame({"k": np.int32([2]), "j": np.int32([0])})
        s = pd.DataFrame({"j": np.int32([0]), "w": np.int32([100])})
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("a", a)
            c.create_table("r", r)
            c.create_table("s", s)
        q = ("select a.k, r.j, s.w from a left join r on a.k = r.k "
             "left join s on r.j = s.j")
        pd.testing.assert_frame_equal(cs.sql_df(q), cm.sql_df(q))

    def test_decorrelate_shares_identical_subqueries(self):
        # finding 5: identical correlated aggregates share one join
        c = Context()
        c.create_table("t", pd.DataFrame({
            "k": np.int32([1, 1, 2]), "v": np.int32([5, 30, 40])}))
        c.create_table("r", pd.DataFrame({
            "k": np.int32([1, 2]), "w": np.int32([10, 50])}))
        q = ("select t.k, (select avg(r.w) from r where r.k = t.k) as a "
             "from t where t.v > (select avg(r.w) from r where r.k = t.k)"
             " order by t.k")
        df = c.sql_df(q)
        assert df["k"].tolist() == [1] and df["a"].tolist() == [10.0]
        plan = c._plan(q)
        corr = [b for b, _t, _c in plan.bindings
                if b.startswith("#corr")]
        assert len(corr) == 1
