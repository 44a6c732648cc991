"""Distributed ungrouped tail: range-partitioned ORDER BY, sharded
OFFSET/LIMIT, per-shard projection (parallel/dist_ops.dist_orderby /
dist_head / dist_map; executor._ungrouped_tail).

Round-2 verdict item 4: ungrouped results must NOT be replicated on every
device. These tests pin (a) bit-equality with the single-chip path across
ORDER BY / OFFSET / LIMIT / join combinations, and (b) the memory property —
after the distributed sort each device holds O(global/D) rows, asserted via
local capacities.
"""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.parallel import make_engine_mesh, shard_batch
from harkdb_tpu.parallel.dist_ops import dist_head, dist_orderby

CFG = EngineConfig()


@pytest.fixture(scope="module")
def mesh():
    return make_engine_mesh(8)


@pytest.fixture
def pair(rng, mesh):
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


def assert_same(dc, sc, q):
    np.testing.assert_array_equal(dc.sql(q), sc.sql(q), err_msg=q)


class TestOrderByE2E:
    def test_single_key(self, pair):
        assert_same(*pair, "select k, v from t order by v")

    def test_desc(self, pair):
        assert_same(*pair, "select k, v from t order by v desc")

    def test_multi_key_mixed(self, pair):
        assert_same(*pair, "select k, v, w from t order by k desc, w, v")

    def test_expression_key(self, pair):
        assert_same(*pair, "select k, v from t order by v * v - k desc")

    def test_ties_stable(self, pair):
        # k has only 12 values over 700 rows: heavy ties; single-chip stable
        # sort keeps original order within ties — the distributed tie chain
        # (pre-shuffle global position) must match exactly.
        assert_same(*pair, "select k, v, w from t order by k")

    def test_where_then_order(self, pair):
        assert_same(*pair, "select v, w from t where v > 0 order by w desc, v")

    def test_float_order_key(self, mesh, rng):
        n = 500
        df = pd.DataFrame({
            "f": (rng.standard_normal(n) * 100).astype(np.float32),
            "i": np.arange(n, dtype=np.int32),
        })
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("ft", df)
        assert_same(dc, sc, "select i, f from ft order by f")
        assert_same(dc, sc, "select i, f from ft order by f desc")


class TestOffsetLimit:
    def test_limit(self, pair):
        assert_same(*pair, "select v from t order by v limit 17")

    def test_offset(self, pair):
        assert_same(*pair, "select v from t order by v desc offset 100")

    def test_offset_limit(self, pair):
        assert_same(*pair,
                    "select k, v from t order by v, k limit 50 offset 333")

    def test_limit_no_order(self, pair):
        # First N rows in ORIGINAL order (shard blocks are contiguous).
        assert_same(*pair, "select k, v from t limit 23")

    def test_offset_past_end(self, pair):
        assert_same(*pair, "select v from t order by v offset 10000")


class TestJoinTail:
    def test_join_order_parity_no_orderby(self, pair):
        assert_same(*pair, "select k, v, m from t join r on t.k = r.j")

    def test_join_with_orderby(self, pair):
        assert_same(*pair,
                    "select k, v, m from t join r on t.k = r.j "
                    "order by m desc, v limit 40")

    def test_left_join_order(self, pair):
        assert_same(*pair,
                    "select k, v, m from t left join r on t.k = r.j "
                    "order by v limit 60")


class TestMemoryProperty:
    def test_local_capacity_stays_sharded(self, mesh, rng):
        """After the distributed ORDER BY each device's block capacity is
        O(global/D) — never the full table (the replication the round-2
        verdict flagged). 2x slack for the power-of-two bucket granule."""
        n = 1 << 16
        v = rng.integers(0, 1 << 30, n).astype(np.int32)
        sb = shard_batch({"v": v}, n, mesh, CFG)
        out = dist_orderby(
            sb, lambda cols, cap: [cols["v"]], [False], mesh, CFG
        )
        D = mesh.devices.size
        assert out.local_capacity <= (n // D) * 4, (
            out.local_capacity, n // D
        )
        assert int(np.asarray(out.total_rows())) == n
        # Shard blocks concatenate to the globally sorted order.
        C = out.local_capacity
        counts = np.asarray(out.shard_counts)
        blocks = np.asarray(out.columns["v"]).reshape(D, C)
        got = np.concatenate([blocks[i, :counts[i]] for i in range(D)])
        np.testing.assert_array_equal(got, np.sort(v))

    def test_grouped_tail_stays_sharded(self, mesh, rng):
        """Round-4 verdict item 1: a high-cardinality grouped query keeps
        per-device capacities ~1/D of the group count through the ENTIRE
        tail (HAVING / ORDER BY / LIMIT) and stays bit-equal to the
        single-chip result."""
        from harkdb_tpu.parallel.executor import DistExecutor

        n = 1 << 17
        n_groups = 1 << 16                 # >= 64K distinct keys
        df = pd.DataFrame({
            "k": rng.permutation(
                np.tile(np.arange(n_groups, dtype=np.int32), n // n_groups)
            ),
            "v": rng.integers(-50, 50, n).astype(np.int32),
        })
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("t", df)
        q = ("select k, sum(v) as s, count(*) as c from t group by k "
             "having count(*) >= 1 order by k limit 200000")
        got = dc.sql(q)
        np.testing.assert_array_equal(got, sc.sql(q))
        # per-device capacity bound: every recorded tail stage holds
        # O(groups/D) rows (4x slack: power-of-two buckets + row_align)
        plan = dc._plan(q)
        ex = DistExecutor(plan, mesh, CFG, shard_cache=dc._shard_cache)
        ex.execute(dc.tables)
        D = mesh.devices.size
        for stage, cap in ex.last_tail_capacities:
            assert cap <= (n_groups // D) * 4, (stage, cap, n_groups // D)

    def test_grouped_avg_having_on_avg(self, pair):
        assert_same(
            *pair,
            "select k, avg(v) as a from t group by k "
            "having avg(v) > -5 order by a desc, k limit 7",
        )

    def test_grouped_distinct_tail(self, pair):
        assert_same(
            *pair,
            "select distinct w, count(*) from t group by w order by w",
        )

    def test_dist_head_window(self, mesh, rng):
        n = 4096
        v = np.arange(n, dtype=np.int32)
        sb = shard_batch({"v": v}, n, mesh, CFG)
        out = dist_head(sb, 1000, 500, mesh, CFG)
        D = mesh.devices.size
        C = out.local_capacity
        counts = np.asarray(out.shard_counts)
        blocks = np.asarray(out.columns["v"]).reshape(D, C)
        got = np.concatenate([blocks[i, :counts[i]] for i in range(D)])
        np.testing.assert_array_equal(got, v[1000:1500])


class TestFallbackPath:
    def test_dist_tail_off_matches(self, mesh, rng):
        cfg = EngineConfig(dist_tail=False)
        n = 400
        df = pd.DataFrame({
            "k": rng.integers(0, 9, n).astype(np.int32),
            "v": rng.integers(-50, 50, n).astype(np.int32),
        })
        dc = Context(cfg, mesh=mesh)
        sc = Context(cfg)
        for c in (dc, sc):
            c.create_table("t", df)
        assert_same(dc, sc, "select k, v from t order by v desc limit 19")


class TestDistinctDistributed:
    """DISTINCT runs sharded too: per-shard dedupe -> tuple-hash shuffle ->
    dedupe -> range-partitioned order. Must be bit-equal to single-chip."""

    def test_distinct(self, pair):
        assert_same(*pair, "select distinct k from t")

    def test_distinct_multicol(self, pair):
        assert_same(*pair, "select distinct k, w from t")

    def test_distinct_orderby_limit(self, pair):
        assert_same(*pair,
                    "select distinct k, w from t order by w desc, k limit 9")

    def test_distinct_expression(self, pair):
        assert_same(*pair, "select distinct v % 7 from t where v > 0")

    def test_distinct_after_join(self, pair):
        assert_same(*pair,
                    "select distinct k, m from t join r on t.k = r.j "
                    "order by m")


def test_dist_orderby_int64_keys_route_monotone(rng):
    """Round-3 review: the range-partition routing view must not truncate
    int64 keys to int32 (wrapping makes shard ranges overlap)."""
    import jax
    from harkdb_tpu import Context
    from harkdb_tpu.config import EngineConfig

    jax.config.update("jax_enable_x64", True)
    try:
        cfg = EngineConfig(int_dtype="int64")
        vals = (rng.integers(-(2**40), 2**40, 2048)).astype(np.int64)
        import pandas as pd

        df = pd.DataFrame({"v": vals})
        cs = Context(cfg)
        cs.create_table("t", df)
        cm = Context(cfg, mesh=make_engine_mesh(8, cfg))
        cm.create_table("t", df)
        q = "select v from t order by v limit 50"
        np.testing.assert_array_equal(cs.sql(q), cm.sql(q))
    finally:
        jax.config.update("jax_enable_x64", False)
