"""COUNT(DISTINCT x) — grouped, ungrouped, and distributed.

Round-2 verdict found the planner silently dropped the DISTINCT flag and
returned plain COUNT. These tests pin the fix: the exact verdict repro, a
pandas-nunique differential, multi-distinct-column queries, and the 8-device
distributed path (whose partials CANNOT be summed — pre-grouping at
(key, value) granularity is required, parallel/dist_ops.py).
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.parallel import make_engine_mesh

CFG = EngineConfig()


@pytest.fixture(scope="module")
def mesh():
    return make_engine_mesh(8)


def test_verdict_repro():
    """select k, count(distinct v) ... must return [[1,2],[2,1]]."""
    c = Context()
    c.create_table("t", pd.DataFrame({
        "k": np.array([1, 1, 1, 2, 2], np.int32),
        "v": np.array([5, 5, 7, 9, 9], np.int32),
    }))
    out = c.sql("select k, count(distinct v) from t group by k")
    np.testing.assert_array_equal(out, [[1, 2], [2, 1]])


def test_grouped_vs_pandas(rng):
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n).astype(np.int32),
        "v": rng.integers(0, 25, n).astype(np.int32),
        "w": rng.integers(-40, 40, n).astype(np.int32),
    })
    c = Context()
    c.create_table("t", df)
    out = c.sql_df(
        "select k, count(distinct v), sum(w), count(*) from t group by k"
    )
    exp = (
        df.groupby("k")
        .agg(nd=("v", "nunique"), s=("w", "sum"), c=("w", "size"))
        .reset_index()
        .sort_values("k")
    )
    np.testing.assert_array_equal(out.iloc[:, 0], exp["k"])
    np.testing.assert_array_equal(out.iloc[:, 1], exp["nd"])
    np.testing.assert_array_equal(out.iloc[:, 2], exp["s"])
    np.testing.assert_array_equal(out.iloc[:, 3], exp["c"])


def test_ungrouped(rng):
    v = rng.integers(0, 30, 500).astype(np.int32)
    c = Context()
    c.create_table("t", pd.DataFrame({"v": v}))
    out = c.sql("select count(distinct v) from t")
    assert out[0][0] == len(np.unique(v))


def test_with_where_and_having(rng):
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 8, n).astype(np.int32),
        "v": rng.integers(0, 15, n).astype(np.int32),
    })
    c = Context()
    c.create_table("t", df)
    out = c.sql_df(
        "select k, count(distinct v) as nd from t where v > 3 group by k "
        "having count(distinct v) > 5 order by k"
    )
    f = df[df.v > 3]
    exp = f.groupby("k")["v"].nunique()
    exp = exp[exp > 5]
    np.testing.assert_array_equal(out["k"], exp.index.to_numpy())
    np.testing.assert_array_equal(out["nd"], exp.to_numpy())


def test_multiple_distinct_columns(rng):
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n).astype(np.int32),
        "a": rng.integers(0, 7, n).astype(np.int32),
        "b": rng.integers(0, 50, n).astype(np.int32),
    })
    c = Context()
    c.create_table("t", df)
    out = c.sql_df(
        "select k, count(distinct a), count(distinct b) from t group by k"
    )
    exp = df.groupby("k").agg(
        na=("a", "nunique"), nb=("b", "nunique")
    ).reset_index()
    np.testing.assert_array_equal(out.iloc[:, 1], exp["na"])
    np.testing.assert_array_equal(out.iloc[:, 2], exp["nb"])


def test_distinct_of_group_key(rng):
    df = pd.DataFrame({"k": rng.integers(0, 5, 100).astype(np.int32)})
    c = Context()
    c.create_table("t", df)
    out = c.sql_df("select k, count(distinct k) from t group by k")
    assert (out.iloc[:, 1] == 1).all()


def test_output_header_names():
    c = Context()
    c.create_table("t", pd.DataFrame({
        "k": np.array([1], np.int32), "v": np.array([2], np.int32),
    }))
    out = c.sql_df("select k, count(distinct v) from t group by k")
    assert list(out.columns)[1] == "count(distinct v)"


def test_distinct_only_count():
    from harkdb_tpu.sql.parser import parse_sql, SqlError

    with pytest.raises(SqlError):
        parse_sql("select sum(distinct v) from t")
    with pytest.raises(SqlError):
        parse_sql("select count(distinct *) from t")


def test_distributed_matches_single_chip(mesh, rng):
    n = 900
    df = pd.DataFrame({
        "k": rng.integers(0, 11, n).astype(np.int32),
        "v": rng.integers(0, 20, n).astype(np.int32),
        "w": rng.integers(-30, 30, n).astype(np.int32),
    })
    dc = Context(CFG, mesh=mesh)
    sc = Context(CFG)
    for c in (dc, sc):
        c.create_table("t", df)
    for q in (
        "select k, count(distinct v) from t group by k",
        "select k, count(distinct v), sum(w), min(w) from t group by k",
        "select count(distinct v) from t",
        "select k, count(distinct v), count(distinct w) from t "
        "where w > -10 group by k order by k desc",
    ):
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q), err_msg=q)


def test_distributed_overlapping_values(mesh):
    """Same value of a key on many shards must count ONCE (the partial-sum
    trap this feature's distributed path exists to avoid)."""
    n = 800
    df = pd.DataFrame({
        "k": np.zeros(n, np.int32),
        "v": np.full(n, 42, np.int32),      # one value, every shard
    })
    dc = Context(CFG, mesh=mesh)
    dc.create_table("t", df)
    out = dc.sql("select k, count(distinct v), count(*) from t group by k")
    np.testing.assert_array_equal(out, [[0, 1, n]])
