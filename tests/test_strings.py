"""String column support: order-preserving dictionary encoding.

The reference is numeric-only (its tables are i32 Futhark matrices,
``table.py:60-62``); string columns are an engine extension. Design under
test: strings dictionary-encode at ingest into int32 codes assigned in
lexicographic order (``columnar/ingest.py:encode_strings``), all string
semantics lower to integer code operations at plan time
(``plan/planner.py`` string lowering), cross-dictionary joins/comparisons
merge dictionaries host-side with code-remap LUTs, and ``sql_df`` decodes
output codes back to strings. The device never sees a string.

Tests are differential against pandas wherever the query maps cleanly.
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context
from harkdb_tpu.plan.planner import PlanError
from harkdb_tpu.sql.parser import SqlError


CITIES = ["oslo", "bergen", "tromso", "stavanger", "narvik", "alta"]


@pytest.fixture
def sctx(rng):
    c = Context()
    n = 400
    df = pd.DataFrame({
        "city": rng.choice(CITIES, n),
        "tag": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(-50, 50, n).astype(np.int32),
    })
    c.create_table("t", df)
    return c, df


def sorted_eq(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(gs, ws, check_dtype=False)


class TestStringFilters:
    def test_equality(self, sctx):
        c, df = sctx
        got = c.sql_df("select city, v from t where city = 'oslo'")
        want = df[df.city == "oslo"][["city", "v"]]
        sorted_eq(got, want)

    def test_equality_absent_value(self, sctx):
        c, _df = sctx
        got = c.sql_df("select city from t where city = 'nowhere'")
        assert len(got) == 0

    def test_inequality_absent_is_all(self, sctx):
        c, df = sctx
        got = c.sql_df("select city from t where city != 'nowhere'")
        assert len(got) == len(df)

    def test_range_ops_match_lexicographic(self, sctx):
        c, df = sctx
        for op in ["<", "<=", ">", ">="]:
            got = c.sql_df(f"select city, v from t where city {op} 'narvik'")
            want = df[eval(f"df.city {op if op != '=' else '=='} 'narvik'")][
                ["city", "v"]
            ]
            sorted_eq(got, want)

    def test_range_literal_between_dictionary_entries(self, sctx):
        # 'n' is not in the dictionary: searchsorted boundary semantics.
        c, df = sctx
        got = c.sql_df("select city from t where city < 'n'")
        want = df[df.city < "n"][["city"]]
        sorted_eq(got, want)

    def test_literal_on_left_mirrors(self, sctx):
        c, df = sctx
        got = c.sql_df("select city from t where 'n' < city")
        want = df[df.city > "n"][["city"]]
        sorted_eq(got, want)

    def test_in_and_between(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select city, v from t where city in ('oslo', 'alta', 'zzz')"
        )
        want = df[df.city.isin(["oslo", "alta"])][["city", "v"]]
        sorted_eq(got, want)
        got = c.sql_df(
            "select city from t where city between 'b' and 'o'"
        )
        want = df[(df.city >= "b") & (df.city <= "o")][["city"]]
        sorted_eq(got, want)

    def test_escaped_quote_literal(self):
        c = Context()
        c.create_table("q", {"s": ["it's", "plain"], "v": [1, 2]})
        got = c.sql_df("select v from q where s = 'it''s'")
        assert got["v"].tolist() == [1]


class TestLike:
    def test_prefix(self, sctx):
        c, df = sctx
        got = c.sql_df("select city from t where city like 'b%'")
        want = df[df.city.str.startswith("b")][["city"]]
        sorted_eq(got, want)

    def test_suffix_and_contains(self, sctx):
        c, df = sctx
        got = c.sql_df("select city from t where city like '%o'")
        want = df[df.city.str.endswith("o")][["city"]]
        sorted_eq(got, want)
        got = c.sql_df("select city from t where city like '%av%'")
        want = df[df.city.str.contains("av")][["city"]]
        sorted_eq(got, want)

    def test_underscore(self, sctx):
        c, df = sctx
        got = c.sql_df("select city from t where city like '_slo'")
        want = df[df.city.str.fullmatch(".slo")][["city"]]
        sorted_eq(got, want)

    def test_not_like(self, sctx):
        c, df = sctx
        got = c.sql_df("select city from t where city not like 'b%'")
        want = df[~df.city.str.startswith("b")][["city"]]
        sorted_eq(got, want)

    def test_scattered_match_lut_path(self, rng):
        # A big dictionary with a non-contiguous match set (>32 runs) takes
        # the LutMember boolean-gather path; differential vs pandas.
        c = Context()
        words = [f"w{i:04d}{'x' if i % 3 == 0 else 'y'}" for i in range(300)]
        vals = rng.choice(words, 2000)
        df = pd.DataFrame({"s": vals, "v": np.arange(2000, dtype=np.int32)})
        c.create_table("t", df)
        got = c.sql_df("select s, v from t where s like '%x'")
        want = df[df.s.str.endswith("x")][["s", "v"]]
        sorted_eq(got, want)

    def test_like_on_numeric_rejected(self, sctx):
        c, _df = sctx
        with pytest.raises(PlanError):
            c.sql_df("select v from t where v like '1%'")

    def test_like_requires_literal_pattern(self, sctx):
        c, _df = sctx
        with pytest.raises(SqlError):
            c.sql_df("select v from t where city like city")


class TestStringGroupOrder:
    def test_group_by_string(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select city, sum(v) as s, count(*) as n from t group by city"
        )
        want = (
            df.groupby("city", as_index=False)
            .agg(s=("v", "sum"), n=("v", "size"))
        )
        sorted_eq(got, want)
        # single-key string groupby emits ascending (lexicographic) keys
        assert got["city"].tolist() == sorted(got["city"].tolist())

    def test_multi_key_string_group(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select city, tag, count(*) as n from t group by city, tag"
        )
        want = df.groupby(["city", "tag"], as_index=False).agg(
            n=("v", "size")
        )
        sorted_eq(got, want)

    def test_order_by_string_is_lexicographic(self, sctx):
        c, df = sctx
        got = c.sql_df("select city, v from t order by city desc, v")
        want = df.sort_values(
            ["city", "v"], ascending=[False, True]
        )[["city", "v"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_min_max_strings_decode(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select min(city) as lo, max(city) as hi, "
            "count(distinct city) as d from t"
        )
        assert got["lo"][0] == df.city.min()
        assert got["hi"][0] == df.city.max()
        assert int(got["d"][0]) == df.city.nunique()

    def test_count_distinct_string_per_group(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select tag, count(distinct city) as d from t group by tag"
        )
        want = df.groupby("tag", as_index=False).agg(d=("city", "nunique"))
        sorted_eq(got, want)

    def test_distinct_string_tuples(self, sctx):
        c, df = sctx
        got = c.sql_df("select distinct city, tag from t")
        want = df[["city", "tag"]].drop_duplicates()
        sorted_eq(got, want)

    def test_case_on_string_condition(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select sum(case when city = 'oslo' then v else 0 end) as s "
            "from t"
        )
        assert int(got["s"][0]) == int(df[df.city == "oslo"].v.sum())

    def test_having_on_string_minmax(self, sctx):
        c, df = sctx
        got = c.sql_df(
            "select tag, max(city) as m from t group by tag "
            "having max(city) >= 'oslo'"
        )
        want = df.groupby("tag", as_index=False).agg(m=("city", "max"))
        want = want[want.m >= "oslo"]
        sorted_eq(got, want)


class TestStringJoins:
    def test_join_on_string_keys_different_dicts(self, rng):
        c = Context()
        left = pd.DataFrame({
            "name": rng.choice(["ada", "bob", "cyd", "dan"], 100),
            "x": rng.integers(0, 100, 100).astype(np.int32),
        })
        right = pd.DataFrame({
            "who": ["bob", "dan", "eve"],          # dict differs from left's
            "y": np.array([7, 8, 9], dtype=np.int32),
        })
        c.create_table("l", left)
        c.create_table("r", right)
        got = c.sql_df(
            "select l.name, l.x, r.y from l join r on l.name = r.who"
        )
        want = left.merge(right, left_on="name", right_on="who")[
            ["name", "x", "y"]
        ]
        sorted_eq(got, want)

    def test_join_key_decodes_through_merged_dict(self, rng):
        c = Context()
        c.create_table("l", pd.DataFrame(
            {"k": ["b", "a", "c"], "x": np.arange(3, dtype=np.int32)}
        ))
        c.create_table("r", pd.DataFrame(
            {"k2": ["c", "b", "z"], "y": np.arange(3, dtype=np.int32)}
        ))
        got = c.sql_df("select l.k, r.k2 from l join r on l.k = r.k2")
        assert got["k"].tolist() == got["k2"].tolist()
        assert sorted(got["k"].tolist()) == ["b", "c"]

    def test_two_chained_string_joins_compose_remaps(self, rng):
        c = Context()
        c.create_table("a", pd.DataFrame(
            {"s": ["m", "n", "p"], "x": np.arange(3, dtype=np.int32)}
        ))
        c.create_table("b", pd.DataFrame(
            {"s2": ["n", "p", "q"], "y": np.arange(3, dtype=np.int32)}
        ))
        c.create_table("d", pd.DataFrame(
            {"s3": ["p", "n", "r"], "z": np.arange(3, dtype=np.int32)}
        ))
        got = c.sql_df(
            "select a.s, b.y, d.z from a "
            "join b on a.s = b.s2 join d on a.s = d.s3"
        )
        af = pd.DataFrame({"s": ["m", "n", "p"], "x": [0, 1, 2]})
        bf = pd.DataFrame({"s2": ["n", "p", "q"], "y": [0, 1, 2]})
        df_ = pd.DataFrame({"s3": ["p", "n", "r"], "z": [0, 1, 2]})
        want = af.merge(bf, left_on="s", right_on="s2").merge(
            df_, left_on="s", right_on="s3"
        )[["s", "y", "z"]]
        sorted_eq(got, want)

    def test_pushdown_literal_uses_original_dict_before_remap(self, rng):
        # WHERE on the string join key pushes down to the base table; the
        # literal must translate against the FINAL (merged) dictionary while
        # the load remap rewrites the codes — both must agree.
        c = Context()
        c.create_table("l", pd.DataFrame(
            {"k": ["b", "a", "c", "b"], "x": np.arange(4, dtype=np.int32)}
        ))
        c.create_table("r", pd.DataFrame(
            {"k2": ["c", "b", "z"], "y": np.arange(3, dtype=np.int32)}
        ))
        got = c.sql_df(
            "select l.k, l.x, r.y from l join r on l.k = r.k2 "
            "where l.k = 'b' order by l.x"
        )
        assert got["k"].tolist() == ["b", "b"]
        assert got["x"].tolist() == [0, 3]
        assert got["y"].tolist() == [1, 1]

    def test_string_to_numeric_join_rejected(self, sctx):
        c, _df = sctx
        c.create_table("n", {"k": [1, 2, 3]})
        with pytest.raises(PlanError):
            c.sql_df("select * from t join n on t.city = n.k")


class TestStringColVsCol:
    def test_same_table_compare(self, rng):
        c = Context()
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z"], 200),
            "b": rng.choice(["x", "y", "z"], 200),
            "v": np.arange(200, dtype=np.int32),
        })
        c.create_table("t", df)
        got = c.sql_df("select v from t where a = b")
        want = df[df.a == df.b][["v"]]
        sorted_eq(got, want)
        got = c.sql_df("select v from t where a < b")
        want = df[df.a < df.b][["v"]]
        sorted_eq(got, want)

    def test_cross_dict_compare_merges(self, rng):
        # Columns ingested separately get different dictionaries; comparing
        # them forces a plan-time merge + code remap.
        c = Context()
        df = pd.DataFrame({
            "a": rng.choice(["ant", "bee", "cat"], 150),
            "b": rng.choice(["bee", "cat", "dog"], 150),
            "v": np.arange(150, dtype=np.int32),
        })
        c.create_table("t", df)
        got = c.sql_df("select v from t where a = b")
        want = df[df.a == df.b][["v"]]
        sorted_eq(got, want)
        got = c.sql_df("select v from t where a >= b")
        want = df[df.a >= df.b][["v"]]
        sorted_eq(got, want)


class TestStringErrors:
    def test_arithmetic_rejected(self, sctx):
        c, _df = sctx
        for q in [
            "select city + 1 from t",
            "select v + city from t",
            "select -city from t",
            "select abs(city) from t",
        ]:
            with pytest.raises(PlanError):
                c.sql_df(q)

    def test_numeric_aggs_rejected(self, sctx):
        c, _df = sctx
        for q in [
            "select sum(city) from t",
            "select avg(city) from t",
            "select prod(city) from t",
        ]:
            with pytest.raises(PlanError):
                c.sql_df(q)

    def test_string_numeric_compare_rejected(self, sctx):
        c, _df = sctx
        with pytest.raises(PlanError):
            c.sql_df("select v from t where city = 1")
        with pytest.raises(PlanError):
            c.sql_df("select v from t where v = 'oslo'")

    def test_bare_string_literal_rejected(self, sctx):
        c, _df = sctx
        with pytest.raises(PlanError):
            c.sql_df("select 'hello' from t")

    def test_case_string_result_rejected(self, sctx):
        c, _df = sctx
        with pytest.raises(PlanError):
            c.sql_df(
                "select case when v > 0 then city else city end from t"
            )

    def test_literal_literal_folds(self, sctx):
        c, df = sctx
        got = c.sql_df("select count(*) as n from t where 'a' < 'b'")
        assert int(got["n"][0]) == len(df)
        # Always-false fold: the engine's empty-input aggregate yields an
        # empty result (engine-wide semantic for aggregates over zero rows).
        got = c.sql_df("select count(*) as n from t where 'a' > 'b'")
        assert len(got) == 0 or int(got["n"][0]) == 0


class TestStringDistributed:
    def test_distributed_matches_single(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        mesh = make_engine_mesh(8)
        n = 600
        df = pd.DataFrame({
            "city": rng.choice(CITIES, n),
            "v": rng.integers(-50, 50, n).astype(np.int32),
        })
        q = ("select city, sum(v) as s, count(distinct city) as d "
             "from t where city >= 'b' group by city order by s desc")
        single = Context()
        single.create_table("t", df)
        dist = Context(mesh=mesh)
        dist.create_table("t", df)
        pd.testing.assert_frame_equal(
            single.sql_df(q), dist.sql_df(q), check_dtype=False
        )

    def test_distributed_string_join(self, rng):
        from harkdb_tpu.parallel import make_engine_mesh

        mesh = make_engine_mesh(8)
        left = pd.DataFrame({
            "name": rng.choice(["ada", "bob", "cyd", "dan"], 300),
            "x": rng.integers(0, 100, 300).astype(np.int32),
        })
        right = pd.DataFrame({
            "who": ["bob", "dan", "eve"],
            "y": np.array([7, 8, 9], dtype=np.int32),
        })
        q = ("select l.name, l.x, r.y from l join r on l.name = r.who "
             "order by l.x, l.name")
        single = Context()
        single.create_table("l", left)
        single.create_table("r", right)
        dist = Context(mesh=mesh)
        dist.create_table("l", left)
        dist.create_table("r", right)
        pd.testing.assert_frame_equal(
            single.sql_df(q), dist.sql_df(q), check_dtype=False
        )


class TestStringPersistence:
    def test_save_load_roundtrip(self, tmp_path, sctx):
        c, df = sctx
        q = "select city, sum(v) as s from t group by city"
        before = c.sql_df(q)
        c.save(str(tmp_path))
        c2 = Context()
        c2.load(str(tmp_path))
        after = c2.sql_df(q)
        pd.testing.assert_frame_equal(before, after, check_dtype=False)

    def test_csv_ingest_strings(self, tmp_path):
        p = tmp_path / "s.csv"
        p.write_text("name,score\nzoe,3\nabe,1\nzoe,5\n")
        c = Context()
        c.create_table("s", str(p))
        got = c.sql_df(
            "select name, sum(score) as t from s group by name"
        )
        assert got["name"].tolist() == ["abe", "zoe"]
        assert got["t"].tolist() == [1, 8]


class TestLeftJoinStringNull:
    def test_unmatched_rows_decode_to_none(self):
        """Round-4: LEFT-JOIN unmatched rows carry a hidden matched flag;
        sql_df decodes unmatched string cells to None (previously they
        zero-filled and decoded to the smallest dictionary entry)."""
        c = Context()
        c.create_table("l", pd.DataFrame(
            {"k": [1, 2], "x": np.array([10, 20], np.int32)}
        ))
        c.create_table("r", pd.DataFrame({"k2": [1, 3],
                                          "tag": ["zulu", "alpha"]}))
        got = c.sql_df(
            "select l.k, r.tag from l left join r on l.k = r.k2 order by l.k"
        )
        assert got["tag"].tolist()[0] == "zulu"
        # decoded to None host-side; pandas' Arrow-string dtype surfaces
        # missing as NaN — isna() is the portable check
        assert got["tag"].isna().tolist() == [False, True]
        # the raw code matrix keeps the 0-fill (reference-shaped output)
        raw = c.sql(
            "select l.k, r.tag from l left join r on l.k = r.k2 order by l.k"
        )
        assert raw[1, 1] == 0
