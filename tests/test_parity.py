"""Reference-parity pins for deliberate semantic deviations.

Two observable contracts of the reference are pinned here explicitly:

* **Group-key output order for negative keys.** The reference's groupby
  sorts keys as u32 bit patterns (radix sort, ``groupby.fut:21-22``), so
  negative keys come out AFTER non-negative ones. This engine defaults to
  signed-ascending (identical whenever keys are non-negative — the only case
  the reference's own homogeneous-int tables exercise); the opt-in
  ``EngineConfig.compat_u32_key_order`` reproduces the u32 order exactly.

* **``expand_outer_reduce`` folds ``ne`` as an initial element**
  (``segmented.fut:97-103``: every segment is prepended with ``ne``), which
  is observable when ``ne`` is not a true identity of ``op``.
"""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.ops.groupby import groupby_aggregate
from harkdb_tpu.parallel import make_engine_mesh
from harkdb_tpu.prims import expand_outer_reduce


def _neg_key_frame():
    return pd.DataFrame({
        "k": np.array([3, -2, 0, -2, 3, -1, 0, 7], np.int32),
        "v": np.array([1, 2, 3, 4, 5, 6, 7, 8], np.int32),
    })


class TestGroupKeyOrder:
    def test_default_signed_ascending(self):
        ctx = Context(EngineConfig())
        ctx.create_table("t", _neg_key_frame())
        out = ctx.sql("select k, sum(v) from t group by k")
        np.testing.assert_array_equal(out[:, 0], [-2, -1, 0, 3, 7])
        np.testing.assert_array_equal(out[:, 1], [6, 6, 10, 6, 8])

    def test_compat_u32_order_negatives_last(self):
        # Reference contract: u32 bit-pattern order = non-negatives ascending,
        # then negatives ascending (0x80000000 .. 0xFFFFFFFF).
        ctx = Context(EngineConfig(compat_u32_key_order=True))
        ctx.create_table("t", _neg_key_frame())
        out = ctx.sql("select k, sum(v) from t group by k")
        np.testing.assert_array_equal(out[:, 0], [0, 3, 7, -2, -1])
        np.testing.assert_array_equal(out[:, 1], [10, 6, 8, 6, 6])

    def test_compat_matches_default_for_nonnegative_keys(self):
        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "k": rng.integers(0, 50, 400).astype(np.int32),
            "v": rng.integers(-9, 9, 400).astype(np.int32),
        })
        a = Context(EngineConfig())
        b = Context(EngineConfig(compat_u32_key_order=True))
        for c in (a, b):
            c.create_table("t", df)
        q = "select k, sum(v), count(v), max(v) from t group by k"
        np.testing.assert_array_equal(a.sql(q), b.sql(q))

    def test_compat_distributed_matches_single_chip(self):
        cfg = EngineConfig(compat_u32_key_order=True)
        mesh = make_engine_mesh(8)
        dc = Context(cfg, mesh=mesh)
        sc = Context(cfg)
        for c in (dc, sc):
            c.create_table("t", _neg_key_frame())
        q = "select k, sum(v), min(v) from t group by k"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))

    def test_direct_aggregate_u32_order(self):
        keys = jnp.array([5, -5, 5, 0, -5], jnp.int32)
        vals = jnp.array([1, 2, 3, 4, 5], jnp.int32)
        keys_out, outs, n = groupby_aggregate(
            keys, [(vals, "sum")], jnp.int32(5), u32_key_order=True
        )
        assert int(n) == 3
        np.testing.assert_array_equal(np.asarray(keys_out[0])[:3], [0, 5, -5])
        np.testing.assert_array_equal(np.asarray(outs[0])[:3], [4, 4, 7])


class TestExpandOuterReduceFoldsNe:
    def test_non_identity_ne_is_folded(self):
        # segmented.fut:97-103: segment i becomes [ne] ++ elems, so with
        # op=add, ne=5: non-empty rows gain +5; an empty row is exactly ne.
        sizes = jnp.array([2, 0, 1], jnp.int32)
        vals = jnp.array([10, 20, 30], jnp.int32)

        def get(src_ids, local):
            return vals[src_ids] + local

        out, n = expand_outer_reduce(sizes, get, jnp.add, 5, out_capacity=8)
        # row0: 5 + (10 + 11) = 26; row1: ne = 5; row2: 5 + 30 = 35
        np.testing.assert_array_equal(np.asarray(out)[:3], [26, 5, 35])

    def test_identity_ne_matches_expand_reduce(self):
        from harkdb_tpu.prims import expand_reduce

        sizes = jnp.array([3, 1, 2], jnp.int32)
        vals = jnp.array([4, 7, 2], jnp.int32)

        def get(src_ids, local):
            return vals[src_ids] * (local + 1)

        a, _ = expand_reduce(sizes, get, jnp.add, 0, out_capacity=8)
        b, _ = expand_outer_reduce(sizes, get, jnp.add, 0, out_capacity=8)
        np.testing.assert_array_equal(np.asarray(a)[:3], np.asarray(b)[:3])

    def test_max_with_floor_ne(self):
        # ne acts as a floor when it is not the identity of max.
        sizes = jnp.array([2, 0], jnp.int32)
        vals = jnp.array([3, 100], jnp.int32)

        def get(src_ids, local):
            return vals[src_ids] + local

        out, _ = expand_outer_reduce(
            sizes, get, jnp.maximum, 50, out_capacity=4
        )
        np.testing.assert_array_equal(np.asarray(out)[:2], [50, 50])
