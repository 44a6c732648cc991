"""UNION / UNION ALL (engine extension; the reference grammar is
single-SELECT only, ``parse.py:27-33``).

Semantics under test (``plan/planner.py:UnionPlan``): arms plan
independently; live rows concatenate; every non-ALL junction dedupes
(left-associative, standard SQL); trailing ORDER BY / LIMIT / OFFSET apply
to the combined result and resolve by output name or 1-based ordinal;
string outputs merge dictionaries position-wise.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError


@pytest.fixture
def uctx(rng):
    c = Context()
    a = pd.DataFrame({
        "k": rng.integers(0, 6, 200).astype(np.int32),
        "v": rng.integers(-40, 40, 200).astype(np.int32),
    })
    b = pd.DataFrame({
        "k": rng.integers(3, 9, 150).astype(np.int32),
        "v": rng.integers(-40, 40, 150).astype(np.int32),
    })
    c.create_table("a", a)
    c.create_table("b", b)
    return c, a, b


def sorted_eq(got: pd.DataFrame, want: pd.DataFrame):
    assert list(got.columns) == list(want.columns)
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(gs, ws, check_dtype=False)


class TestUnionAll:
    def test_concat(self, uctx):
        c, a, b = uctx
        got = c.sql_df("select k, v from a union all select k, v from b")
        want = pd.concat([a, b], ignore_index=True)
        sorted_eq(got, want)

    def test_with_filters(self, uctx):
        c, a, b = uctx
        got = c.sql_df(
            "select k, v from a where v > 0 "
            "union all select k, v from b where v < 0"
        )
        want = pd.concat([a[a.v > 0], b[b.v < 0]], ignore_index=True)
        sorted_eq(got, want)

    def test_three_arms(self, uctx):
        c, a, b = uctx
        got = c.sql_df(
            "select k from a union all select k from b "
            "union all select k from a"
        )
        assert len(got) == 2 * len(a) + len(b)


class TestUnionDistinct:
    def test_dedupe(self, uctx):
        c, a, b = uctx
        got = c.sql_df("select k, v from a union select k, v from b")
        want = pd.concat([a, b], ignore_index=True).drop_duplicates()
        sorted_eq(got, want)

    def test_mixed_chain_left_assoc(self, uctx):
        # (a UNION b) dedupes; then UNION ALL appends duplicates untouched.
        c, a, b = uctx
        got = c.sql_df(
            "select k from a union select k from b union all select k from b"
        )
        dd = pd.concat([a[["k"]], b[["k"]]]).drop_duplicates()
        assert len(got) == len(dd) + len(b)

    def test_grouped_arms(self, uctx):
        c, a, b = uctx
        got = c.sql_df(
            "select k, sum(v) as s from a group by k "
            "union select k, sum(v) as s from b group by k"
        )
        wa = a.groupby("k", as_index=False).agg(s=("v", "sum"))
        wb = b.groupby("k", as_index=False).agg(s=("v", "sum"))
        want = pd.concat([wa, wb], ignore_index=True).drop_duplicates()
        sorted_eq(got, want)


class TestUnionTail:
    def test_order_by_name_and_ordinal(self, uctx):
        c, a, b = uctx
        got = c.sql_df(
            "select k, v from a union select k, v from b order by k desc, v"
        )
        want = (pd.concat([a, b], ignore_index=True).drop_duplicates()
                .sort_values(["k", "v"], ascending=[False, True])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )
        got2 = c.sql_df(
            "select k, v from a union select k, v from b order by 1 desc, 2"
        )
        pd.testing.assert_frame_equal(got2, got, check_dtype=False)

    def test_limit_offset(self, uctx):
        c, a, b = uctx
        full = c.sql_df(
            "select k, v from a union select k, v from b order by k, v"
        )
        part = c.sql_df(
            "select k, v from a union select k, v from b "
            "order by k, v limit 5 offset 3"
        )
        pd.testing.assert_frame_equal(
            part.reset_index(drop=True),
            full.iloc[3:8].reset_index(drop=True),
            check_dtype=False,
        )

    def test_int_float_promotion(self, uctx):
        c, a, _b = uctx
        got = c.sql_df(
            "select k, avg(v) as x from a group by k "
            "union all select k, v from a"
        )
        assert len(got) == a.k.nunique() + len(a)
        assert got["x"].dtype.kind == "f"

    def test_int_float_promotion_rejects_lossy_cast(self):
        # int32 above float32's exact-integer span (2^24) would silently
        # corrupt in the promotion cast (advisor r3) — must error instead.
        c = Context()
        c.create_table("big", pd.DataFrame(
            {"v": np.array([1 << 25, 3], np.int32)}
        ))
        c.create_table("fl", pd.DataFrame(
            {"v": np.array([0.5], np.float32)}
        ))
        with pytest.raises(PlanError, match="exact-integer span"):
            c.sql_df("select v from big union all select v from fl")
        # in-range ints still promote fine
        got = c.sql_df(
            "select v from big where v < 100 union all select v from fl"
        )
        assert sorted(got["v"].tolist()) == [0.5, 3.0]


class TestUnionStrings:
    def test_string_dicts_merge(self):
        c = Context()
        c.create_table("s1", pd.DataFrame({"s": ["x", "y"], "n": [1, 2]}))
        c.create_table("s2", pd.DataFrame({"s": ["y", "z"], "n": [2, 9]}))
        got = c.sql_df("select s, n from s1 union select s, n from s2 "
                       "order by s")
        assert got["s"].tolist() == ["x", "y", "z"]
        assert got["n"].tolist() == [1, 2, 9]

    def test_mixed_string_numeric_rejected(self):
        c = Context()
        c.create_table("s1", pd.DataFrame({"s": ["x"], "n": [1]}))
        with pytest.raises(PlanError):
            c.sql_df("select s from s1 union select n from s1")


class TestUnionErrors:
    def test_arity_mismatch(self, uctx):
        c, _a, _b = uctx
        with pytest.raises(PlanError):
            c.sql_df("select k, v from a union select k from b")

    def test_order_by_unknown(self, uctx):
        c, _a, _b = uctx
        with pytest.raises(PlanError):
            c.sql_df("select k from a union select k from b order by zzz")


class TestUnionDistributed:
    def test_matches_single(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        mesh = make_engine_mesh(8)
        a = pd.DataFrame({
            "k": rng.integers(0, 5, 300).astype(np.int32),
            "v": rng.integers(0, 100, 300).astype(np.int32),
        })
        b = pd.DataFrame({
            "k": rng.integers(3, 8, 300).astype(np.int32),
            "v": rng.integers(0, 100, 300).astype(np.int32),
        })
        q = ("select k, sum(v) as s from a group by k "
             "union select k, sum(v) as s from b group by k order by k, s")
        cs = Context()
        cs.create_table("a", a)
        cs.create_table("b", b)
        cm = Context(mesh=mesh)
        cm.create_table("a", a)
        cm.create_table("b", b)
        pd.testing.assert_frame_equal(
            cm.sql_df(q), cs.sql_df(q), check_dtype=False
        )

    QUERIES = [
        # plain UNION ALL, no ORDER BY: output must reproduce the
        # single-chip arm-concatenation order (#upos tie)
        "select k, v from a union all select k, v from b",
        "select k, v from a union select k, v from b order by k, v",
        "select k, v from a where v > 40 union all select k, v from b "
        "order by v desc, k limit 17",
        # mixed ALL / distinct junctions, offset window
        "select k from a union select k from b union all select k from a "
        "order by k limit 10 offset 3",
        # int/float promotion through the sharded tail
        "select k, avg(v) as x from a group by k "
        "union all select k, v from b order by x, k limit 25",
    ]

    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_sharded_tail_matches_single(self, rng, qi):
        from harkdb_tpu.parallel import make_engine_mesh

        a = pd.DataFrame({
            "k": rng.integers(0, 9, 400).astype(np.int32),
            "v": rng.integers(0, 100, 400).astype(np.int32),
        })
        b = pd.DataFrame({
            "k": rng.integers(4, 12, 250).astype(np.int32),
            "v": rng.integers(0, 100, 250).astype(np.int32),
        })
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("a", a)
            c.create_table("b", b)
        q = self.QUERIES[qi]
        pd.testing.assert_frame_equal(
            cm.sql_df(q), cs.sql_df(q), check_dtype=False
        )

    def test_string_union_distributed(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        s1 = pd.DataFrame({"s": rng.choice(["ant", "bee", "cat"], 200),
                           "n": rng.integers(0, 50, 200).astype(np.int32)})
        s2 = pd.DataFrame({"s": rng.choice(["bee", "dog", "elk"], 150),
                           "n": rng.integers(0, 50, 150).astype(np.int32)})
        cs = Context()
        cm = Context(mesh=make_engine_mesh(8))
        for c in (cs, cm):
            c.create_table("s1", s1)
            c.create_table("s2", s2)
        q = ("select s, n from s1 union select s, n from s2 "
             "order by s, n limit 30")
        pd.testing.assert_frame_equal(cm.sql_df(q), cs.sql_df(q))

    def test_union_all_memory_stays_sharded(self, rng):
        """Round-4 item 5: an 8-device UNION ALL of two large tables keeps
        per-device capacity at ~1/D of the combined rows through the tail."""
        from harkdb_tpu.parallel import make_engine_mesh
        from harkdb_tpu.parallel import sharded as _sh

        mesh = make_engine_mesh(8)
        n = 1 << 15
        a = pd.DataFrame({"v": rng.integers(0, 1 << 20, n).astype(np.int32)})
        b = pd.DataFrame({"v": rng.integers(0, 1 << 20, n).astype(np.int32)})
        cm = Context(mesh=mesh)
        cm.create_table("a", a)
        cm.create_table("b", b)
        seen = []
        orig = _sh.ShardedBatch.to_batch

        def spy(self):
            seen.append(self.local_capacity)
            return orig(self)

        _sh.ShardedBatch.to_batch = spy
        try:
            got = cm.sql_df(
                "select v from a union all select v from b order by v"
            )
        finally:
            _sh.ShardedBatch.to_batch = orig
        assert len(got) == 2 * n
        assert seen and seen[-1] <= (2 * n // 8) * 4, seen
