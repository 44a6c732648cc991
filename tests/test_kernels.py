"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU)."""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.kernels.matmul_agg import (
    _balanced_digits, matmul_agg_applicable, onehot_groupby_sums,
)


class TestBalancedDigits:
    def test_extremes_exact(self):
        v = jnp.asarray(np.array(
            [0, 1, -1, 2**31 - 1, -2**31, 123456789, -987654321], np.int32
        ))
        ds = _balanced_digits(v)
        assert all(
            int(d.min()) >= -128 and int(d.max()) <= 127 for d in ds
        )
        recon = sum(
            (d.astype(jnp.int32) << (8 * i)) for i, d in enumerate(ds)
        )
        np.testing.assert_array_equal(np.asarray(recon), np.asarray(v))


class TestOnehotGroupby:
    def test_vs_pandas(self, rng):
        n = 6000
        k = rng.integers(10, 200, n).astype(np.int32)
        val = rng.integers(-(10**6), 10**6, n).astype(np.int32)
        counts, sums, keys_axis = onehot_groupby_sums(
            jnp.asarray(k), [jnp.asarray(val)], jnp.int32(n),
            jnp.int32(10), 191, interpret=True,
        )
        g = pd.DataFrame({"k": k, "v": val}).groupby("k")["v"].agg(
            ["sum", "count"]
        )
        cc, ss = np.asarray(counts), np.asarray(sums[0])
        for key, row in g.iterrows():
            assert cc[key - 10] == row["count"]
            assert ss[key - 10] == np.int32(row["sum"])

    def test_mask_and_padding(self, rng):
        n = 3000
        k = rng.integers(0, 50, n).astype(np.int32)
        v = np.ones(n, np.int32)
        mask = rng.random(n) < 0.5
        counts, sums, _ = onehot_groupby_sums(
            jnp.asarray(k), [jnp.asarray(v)], jnp.int32(2000),
            jnp.int32(0), 50, mask=jnp.asarray(mask), interpret=True,
        )
        live = mask[:2000]
        assert int(np.asarray(counts).sum()) == int(live.sum())
        np.testing.assert_array_equal(
            np.asarray(counts), np.bincount(k[:2000][live], minlength=50)
        )

    def test_int32_wraparound_matches_sort_path(self):
        # Sums that overflow int32 must wrap identically on both paths.
        k = np.zeros(4, np.int32)
        v = np.full(4, 2**30, np.int32)
        counts, sums, _ = onehot_groupby_sums(
            jnp.asarray(k), [jnp.asarray(v)], jnp.int32(4),
            jnp.int32(0), 1, interpret=True,
        )
        # 4 * 2^30 = 2^32 ≡ 0 (mod 2^32)
        assert int(np.asarray(sums[0])[0]) == 0

    def test_applicability(self):
        assert matmul_agg_applicable(["sum", "count"], 1000)
        assert not matmul_agg_applicable(["max"], 1000)
        assert not matmul_agg_applicable(["sum"], 10**6)


class TestPlannerFastPath:
    def test_fast_path_selected_and_correct(self, rng):
        c = Context()
        n = 4000
        df = pd.DataFrame({
            "k": rng.integers(0, 64, n).astype(np.int32),
            "v": rng.integers(-1000, 1000, n).astype(np.int32),
        })
        c.create_table("t", df)
        q = "select k, sum(v), count(*) from t group by k"
        plan = c._plan(q)
        assert plan.fast_agg is not None      # MXU path engaged
        out = c.sql(q)
        e = df.groupby("k")["v"].agg(["sum", "count"]).reset_index()
        np.testing.assert_array_equal(out, e.to_numpy())

    def test_fast_path_with_where_and_having(self, rng):
        c = Context()
        df = pd.DataFrame({
            "k": rng.integers(0, 32, 2000).astype(np.int32),
            "v": rng.integers(0, 100, 2000).astype(np.int32),
        })
        c.create_table("t", df)
        q = ("select k, avg(v) from t where v > 10 group by k "
             "having count(*) > 20 order by k desc")
        plan = c._plan(q)
        assert plan.fast_agg is not None
        out = c.sql(q)
        f = df[df.v > 10]
        g = f.groupby("k")["v"].agg(["mean", "count"])
        g = g[g["count"] > 20].sort_index(ascending=False)
        np.testing.assert_allclose(out[:, 1], g["mean"].to_numpy(), rtol=1e-6)

    def test_max_forces_sort_path(self, rng):
        c = Context()
        df = pd.DataFrame({"k": np.arange(10, dtype=np.int32),
                           "v": np.arange(10, dtype=np.int32)})
        c.create_table("t", df)
        plan = c._plan("select k, max(v) from t group by k")
        assert plan.fast_agg is None

    def test_wide_keys_force_sort_path(self):
        c = Context()
        df = pd.DataFrame({
            "k": np.array([0, 10**8], np.int32),
            "v": np.array([1, 2], np.int32),
        })
        c.create_table("t", df)
        plan = c._plan("select k, sum(v) from t group by k")
        assert plan.fast_agg is None
        out = c.sql("select k, sum(v) from t group by k")
        np.testing.assert_array_equal(out, [[0, 1], [10**8, 2]])
