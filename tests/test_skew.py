"""Skew-aware salted join repartitioning tests (parallel/skew.py).

A 90%-hot probe key must (a) produce identical rows to the single-chip path
and (b) actually spread across shards instead of overloading one.
"""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.parallel import make_engine_mesh, shard_batch
from harkdb_tpu.parallel.skew import (
    HOT_K, detect_hot_keys, is_member, replicate_hot_build, salted_probe_dest,
)

CFG = EngineConfig()


@pytest.fixture(scope="module")
def mesh():
    return make_engine_mesh(8)


def skewed_tables(rng, n=2000, hot_frac=0.9, hot_key=3):
    lk = np.where(rng.random(n) < hot_frac, hot_key,
                  rng.integers(0, 100, n)).astype(np.int32)
    ldf = pd.DataFrame({"k": lk, "a": np.arange(n, dtype=np.int32)})
    rdf = pd.DataFrame({"j": np.arange(0, 100, dtype=np.int32),
                        "b": rng.integers(0, 1000, 100).astype(np.int32)})
    return ldf, rdf


class TestDetection:
    def test_hot_key_detected(self, mesh, rng):
        n = 1024
        k = np.where(rng.random(n) < 0.8, 7,
                     rng.integers(100, 200, n)).astype(np.int32)
        sb = shard_batch({"k": k}, n, mesh, CFG)

        def body(cols, cnt):
            H, HV = detect_hot_keys(cols["k"], cnt[0], 8, 0.25,
                                    CFG.mesh_axis)
            return H, HV.astype(jnp.int32)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=({"k": P("shards")}, P("shards")),
            out_specs=(P(), P()), check_vma=False,
        ))
        H, HV = f(sb.columns, sb.shard_counts)
        hot = set(np.asarray(H)[np.asarray(HV) > 0].tolist())
        assert 7 in hot

    def test_prefiltered_shard_still_detects(self, mesh, rng):
        """Detection thresholds on LIVE rows, not padded capacity: after an
        upstream filter leaves each shard mostly padding (32 live of 1024
        capacity), a key holding 26/32 live rows must still be nominated.
        A capacity-based threshold (0.25 * 1024 / 8 = 32 > 26) misses it —
        this test fails on the round-2 code."""
        from jax.sharding import NamedSharding

        C, D, live = 1024, 8, 32
        k = rng.integers(100, 200, C * D).astype(np.int32)
        for i in range(D):
            k[i * C: i * C + 26] = 7          # hot key in the live window
        sharding = NamedSharding(mesh, P("shards"))
        cols = {"k": jax.device_put(k, sharding)}
        counts = jax.device_put(
            np.full(D, live, np.int32), sharding
        )

        def body(cols, cnt):
            H, HV = detect_hot_keys(cols["k"], cnt[0], D, 0.25,
                                    CFG.mesh_axis)
            return H, HV.astype(jnp.int32)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=({"k": P("shards")}, P("shards")),
            out_specs=(P(), P()), check_vma=False,
        ))
        H, HV = f(cols, counts)
        hot = set(np.asarray(H)[np.asarray(HV) > 0].tolist())
        assert 7 in hot

    def test_uniform_keys_not_hot(self, mesh, rng):
        n = 1024
        k = rng.permutation(n).astype(np.int32)  # all distinct
        sb = shard_batch({"k": k}, n, mesh, CFG)

        def body(cols, cnt):
            H, HV = detect_hot_keys(cols["k"], cnt[0], 8, 0.25,
                                    CFG.mesh_axis)
            return H, HV.astype(jnp.int32)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=({"k": P("shards")}, P("shards")),
            out_specs=(P(), P()), check_vma=False,
        ))
        _, HV = f(sb.columns, sb.shard_counts)
        assert int(np.asarray(HV).sum()) == 0


class TestPrimitives:
    def test_is_member(self):
        H = jnp.asarray(np.array([5, 9, 0, 0], np.int32))
        HV = jnp.asarray(np.array([True, True, False, False]))
        k = jnp.asarray(np.array([5, 9, 0, 3], np.int32))
        np.testing.assert_array_equal(
            np.asarray(is_member(k, H, HV)), [True, True, False, False]
        )

    def test_salted_probe_spread(self):
        n = 800
        k = jnp.full((n,), 7, jnp.int32)
        hot = jnp.ones((n,), bool)
        dest = np.asarray(salted_probe_dest(k, hot, 8, jnp.int32(0)))
        counts = np.bincount(dest, minlength=8)
        assert counts.min() == counts.max() == 100   # perfect spread

    def test_replicate_hot_build(self):
        cols = {"j": jnp.asarray(np.array([7, 1, 2], np.int32)),
                "b": jnp.asarray(np.array([70, 10, 20], np.int32))}
        hot = jnp.asarray(np.array([True, False, False]))
        exp, total, dest, of = replicate_hot_build(
            cols, "j", jnp.int32(3), hot, 4, out_capacity=16
        )
        assert int(of) == 0
        assert int(total) == 4 + 2          # hot row x4 + two singles
        jj = np.asarray(exp["j"])[:6]
        dd = np.asarray(dest)[:6]
        # hot key copies land on every shard
        assert sorted(dd[jj == 7].tolist()) == [0, 1, 2, 3]
        # values ride along
        np.testing.assert_array_equal(np.asarray(exp["b"])[:4], [70] * 4)


class TestSkewedJoinE2E:
    def test_matches_single_chip(self, mesh, rng):
        ldf, rdf = skewed_tables(rng)
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        q = "select k, a, b from l join r on l.k = r.j"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))

    def test_left_join_skewed(self, mesh, rng):
        ldf, rdf = skewed_tables(rng, n=1000)
        ldf.loc[0, "k"] = 5000                    # unmatched hot-side row
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        q = "select k, a, b from l left join r on l.k = r.j"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))

    def test_join_groupby_skewed(self, mesh, rng):
        ldf, rdf = skewed_tables(rng)
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        q = ("select k, sum(a), max(b), count(*) from l "
             "join r on l.k = r.j group by k")
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))

    def test_salting_disabled_still_correct(self, mesh, rng):
        cfg = EngineConfig(skew_salted_join=False)
        ldf, rdf = skewed_tables(rng, n=500)
        dc = Context(cfg, mesh=mesh)
        sc = Context(cfg)
        for c in (dc, sc):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        q = "select k, a, b from l join r on l.k = r.j"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))
