"""Distributed-layer tests on a virtual 8-device CPU mesh.

Strategy: differential — every query must produce byte-identical output on
the distributed path (row-sharded tables, shard_map + all_to_all shuffle)
and the single-chip path. This is the multi-host-without-a-pod harness from
SURVEY §7 hard part 5.
"""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.parallel import make_engine_mesh, shard_batch
from harkdb_tpu.parallel.shuffle import hash_to_bucket, repartition_by_key

CFG = EngineConfig()


@pytest.fixture(scope="module")
def mesh():
    return make_engine_mesh(8)


@pytest.fixture
def pair(rng, mesh):
    """(distributed ctx, single-chip ctx) with identical tables."""
    n = 700
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n).astype(np.int32),
        "v": rng.integers(-100, 100, n).astype(np.int32),
        "w": rng.integers(1, 50, n).astype(np.int32),
    })
    rdf = pd.DataFrame({
        "j": np.arange(12, dtype=np.int32),
        "m": rng.integers(1, 9, 12).astype(np.int32),
    })
    dc = Context(CFG, mesh=mesh)
    sc = Context(CFG)
    for c in (dc, sc):
        c.create_table("t", df)
        c.create_table("r", rdf)
    return dc, sc


def assert_same(dc, sc, query):
    out_d = dc.sql(query)
    out_s = sc.sql(query)
    np.testing.assert_array_equal(out_d, out_s, err_msg=query)


class TestShuffle:
    def test_hash_spread(self):
        keys = jnp.arange(10000, dtype=jnp.int32)
        buckets = np.asarray(hash_to_bucket(keys, 8))
        counts = np.bincount(buckets, minlength=8)
        assert counts.min() > 800          # roughly uniform
        assert (buckets >= 0).all() and (buckets < 8).all()

    def test_salt_changes_routing(self):
        keys = jnp.arange(1000, dtype=jnp.int32)
        b0 = np.asarray(hash_to_bucket(keys, 8, salt=0))
        b1 = np.asarray(hash_to_bucket(keys, 8, salt=1))
        assert (b0 != b1).any()

    def test_repartition_preserves_multiset(self, mesh, rng):
        n = 512
        k = rng.integers(0, 40, n).astype(np.int32)
        v = rng.integers(0, 1000, n).astype(np.int32)
        sb = shard_batch({"k": k, "v": v}, n, mesh, CFG)
        D = 8
        cap = sb.local_capacity

        def body(cols, cnt):
            out_cols, out_n, overflow = repartition_by_key(
                dict(cols), "k", cnt[0], CFG.mesh_axis, D, cap
            )
            return out_cols, out_n.reshape(1), overflow.reshape(1)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=({"k": P("shards"), "v": P("shards")}, P("shards")),
            out_specs=({"k": P("shards"), "v": P("shards")}, P("shards"),
                       P("shards")),
        ))
        out_cols, out_counts, overflow = f(sb.columns, sb.shard_counts)
        assert int(jnp.max(overflow)) == 0
        # collect live rows across shards
        counts = np.asarray(out_counts)
        kk = np.asarray(out_cols["k"]).reshape(8, -1)
        vv = np.asarray(out_cols["v"]).reshape(8, -1)
        got = []
        for i in range(8):
            for j in range(counts[i]):
                got.append((kk[i, j], vv[i, j]))
        assert sorted(got) == sorted(zip(k.tolist(), v.tolist()))
        # co-location: every key lives on exactly one shard
        key_shards = {}
        for i in range(8):
            for j in range(counts[i]):
                key_shards.setdefault(kk[i, j], set()).add(i)
        assert all(len(s) == 1 for s in key_shards.values())


class TestDistributedQueries:
    def test_projection(self, pair):
        assert_same(*pair, "select k, v from t")

    def test_where(self, pair):
        assert_same(*pair, "select v, w from t where v > 0 and w < 40")

    def test_groupby(self, pair):
        assert_same(*pair, "select k, sum(v), max(w), count(*) from t group by k")

    def test_groupby_having(self, pair):
        assert_same(*pair,
                    "select k, sum(v) from t group by k having count(*) > 40")

    def test_avg(self, pair):
        dc, sc = pair
        q = "select k, avg(w) from t group by k"
        np.testing.assert_allclose(dc.sql(q), sc.sql(q), rtol=1e-6)

    def test_implicit_group(self, pair):
        assert_same(*pair, "select min(v), max(v), count(*) from t")

    def test_join(self, pair):
        assert_same(*pair, "select k, v, m from t join r on t.k = r.j")

    def test_join_groupby(self, pair):
        assert_same(*pair,
                    "select j, sum(v), max(m) from t join r on t.k = r.j "
                    "group by j")

    def test_full_pipeline(self, pair):
        assert_same(*pair,
                    "select k, sum(v), count(*) from t join r on t.k = r.j "
                    "where v > -50 group by k having sum(v) != 0 "
                    "order by k desc limit 7")

    def test_orderby_limit(self, pair):
        assert_same(*pair, "select v from t order by v desc, w limit 25")

    def test_multikey_groupby(self, pair, rng):
        dc, sc = pair
        df2 = pd.DataFrame({
            "a": rng.integers(0, 5, 300).astype(np.int32),
            "b": rng.integers(0, 4, 300).astype(np.int32),
            "x": rng.integers(0, 100, 300).astype(np.int32),
        })
        dc.create_table("t2", df2)
        sc.create_table("t2", df2)
        assert_same(dc, sc, "select a, b, sum(x) from t2 group by a, b")

    def test_empty_result(self, pair):
        assert_same(*pair, "select k from t where k > 1000")

    def test_skewed_keys(self, mesh, rng):
        """90% of rows share one key — exercises bucket-capacity retry."""
        n = 1000
        k = np.where(rng.random(n) < 0.9, 3, rng.integers(0, 50, n)).astype(np.int32)
        v = rng.integers(0, 10, n).astype(np.int32)
        df = pd.DataFrame({"k": k, "v": v})
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        dc.create_table("s", df)
        sc.create_table("s", df)
        assert_same(dc, sc, "select k, sum(v), count(*) from s group by k")


class TestDistributedMXUGate:
    def test_static_span_engages(self, pair):
        dc, sc = pair
        q = "select k, sum(v), count(*) from t group by k"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))
        assert dc._plan(q).last_fast_span is not None

    def test_probed_span_post_where(self, mesh, rng):
        """Key range proven only AFTER the WHERE narrows a wide table —
        the distributed probe must admit it to the MXU pre-aggregate."""
        n = 4000
        wide = rng.integers(0, 1 << 22, n).astype(np.int32)
        sel = rng.random(n) < 0.5
        wide[sel] = rng.integers(0, 500, int(sel.sum()))
        df = pd.DataFrame({
            "k": wide,
            "v": rng.integers(-50, 50, n).astype(np.int32),
        })
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("w", df)
        q = "select k, sum(v), count(*) from w where k < 500 group by k"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))
        assert dc._plan(q).last_fast_span is not None
        # probe result is cached on the plan
        assert getattr(dc._plan(q), "_probed_fast_dist", None) not in (None, ())

    def test_wide_span_stays_on_sort_path(self, mesh, rng):
        n = 2000
        df = pd.DataFrame({
            "k": rng.integers(0, 1 << 22, n).astype(np.int32),
            "v": rng.integers(-50, 50, n).astype(np.int32),
        })
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("w", df)
        q = "select k, sum(v) from w group by k"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))
        assert dc._plan(q).last_fast_span is None
