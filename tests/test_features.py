"""LEFT JOIN, metrics, and persistence tests."""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context, EngineConfig
from harkdb_tpu.parallel import make_engine_mesh

CFG = EngineConfig()


@pytest.fixture
def join_ctx():
    c = Context()
    c.create_table("l", pd.DataFrame({"k": [1, 2, 3, 5], "a": [10, 20, 30, 50]}))
    c.create_table("r", pd.DataFrame({"k2": [2, 3, 3, 4], "b": [200, 300, 301, 400]}))
    return c


class TestLeftJoin:
    def test_basic(self, join_ctx):
        out = join_ctx.sql(
            "select k, a, b from l left join r on l.k = r.k2 order by k, b"
        )
        # unmatched left rows kept, right cols filled with 0
        np.testing.assert_array_equal(out, [
            [1, 10, 0], [2, 20, 200], [3, 30, 300], [3, 30, 301], [5, 50, 0],
        ])

    def test_count_includes_unmatched(self, join_ctx):
        out = join_ctx.sql(
            "select count(*) from l left join r on l.k = r.k2"
        )
        assert out[0, 0] == 5

    def test_vs_pandas(self, rng):
        c = Context()
        nl, nr = 200, 100
        ldf = pd.DataFrame({"k": rng.integers(0, 50, nl).astype(np.int32),
                            "a": np.arange(nl, dtype=np.int32)})
        rdf = pd.DataFrame({"j": rng.integers(0, 50, nr).astype(np.int32),
                            "b": np.arange(nr, dtype=np.int32)})
        c.create_table("l", ldf)
        c.create_table("r", rdf)
        out = c.sql("select k, a, b from l left join r on l.k = r.j "
                    "order by k, a, b")
        m = ldf.merge(rdf, left_on="k", right_on="j", how="left")
        m["b"] = m.b.fillna(0).astype(np.int64)
        e = m.sort_values(["k", "a", "b"], kind="stable")[["k", "a", "b"]]
        np.testing.assert_array_equal(out, e.to_numpy())

    def test_distributed_matches(self, rng):
        mesh = make_engine_mesh(8)
        ldf = pd.DataFrame({"k": rng.integers(0, 30, 300).astype(np.int32),
                            "a": np.arange(300, dtype=np.int32)})
        rdf = pd.DataFrame({"j": rng.integers(0, 30, 100).astype(np.int32),
                            "b": np.arange(100, dtype=np.int32)})
        dc = Context(CFG, mesh=mesh)
        sc = Context(CFG)
        for c in (dc, sc):
            c.create_table("l", ldf)
            c.create_table("r", rdf)
        q = "select k, a, b from l left join r on l.k = r.j"
        np.testing.assert_array_equal(dc.sql(q), sc.sql(q))


class TestMetrics:
    def test_collects(self, join_ctx):
        out = join_ctx.sql("select k from l where k > 1")
        m = join_ctx.last_metrics
        assert m.rows_out == out.shape[0] == 3
        assert m.execute_ms > 0
        assert not m.distributed
        assert "rows_out" in m.to_json()

    def test_plan_cache_flag(self, join_ctx):
        join_ctx.sql("select k from l")
        assert not join_ctx.last_metrics.cached_plan
        join_ctx.sql("select k from l")
        assert join_ctx.last_metrics.cached_plan


class TestPersistence:
    def test_save_load_roundtrip(self, tmp_path, join_ctx):
        q = "select k, a from l order by k"
        expect = join_ctx.sql(q)
        join_ctx.save(str(tmp_path))
        c2 = Context()
        c2.load(str(tmp_path))
        assert set(c2.tables) == {"l", "r"}
        np.testing.assert_array_equal(c2.sql(q), expect)

    def test_float_columns_roundtrip(self, tmp_path):
        c = Context()
        c.create_table("f", pd.DataFrame({"x": [1.5, 2.5], "i": [1, 2]}))
        c.save(str(tmp_path))
        c2 = Context()
        c2.load(str(tmp_path))
        out = c2.sql("select x, i from f")
        np.testing.assert_allclose(out, [[1.5, 1.0], [2.5, 2.0]])


class TestSafetySubsystems:
    def test_debug_checks_pass(self):
        cfg = EngineConfig(debug_checks=True)
        c = Context(cfg)
        c.create_table("t", pd.DataFrame({"a": [1, 2, 3]}))
        out = c.sql("select a from t where a > 1")
        np.testing.assert_array_equal(out, [[2], [3]])

    def test_debug_validate_catches_bad_batch(self):
        import jax.numpy as jnp

        from harkdb_tpu.columnar.batch import ColumnBatch
        from harkdb_tpu.utils.checks import InvariantViolation, debug_validate

        bad = ColumnBatch({"a": jnp.zeros(4, jnp.int32)}, jnp.int32(9))
        with pytest.raises(InvariantViolation):
            debug_validate(bad, "test")

    def test_retry_on_transient_failure(self, monkeypatch):
        c = Context()
        c.create_table("t", pd.DataFrame({"a": [1, 2, 3]}))
        plan = c._plan("select a from t")
        calls = {"n": 0}
        real = plan.execute

        def flaky(tables):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated transient device failure")
            return real(tables)

        monkeypatch.setattr(plan, "execute", flaky)
        out = c.sql("select a from t")
        assert calls["n"] == 2
        np.testing.assert_array_equal(out, [[1], [2], [3]])

    def test_retry_disabled_raises(self, monkeypatch):
        cfg = EngineConfig(retry_on_failure=False)
        c = Context(cfg)
        c.create_table("t", pd.DataFrame({"a": [1]}))
        plan = c._plan("select a from t")

        def boom(tables):
            raise RuntimeError("permanent")

        monkeypatch.setattr(plan, "execute", boom)
        with pytest.raises(RuntimeError, match="permanent"):
            c.sql("select a from t")


class TestMoreAggregates:
    def test_float_aggregation(self, rng):
        c = Context()
        df = pd.DataFrame({
            "k": rng.integers(0, 5, 200).astype(np.int32),
            "x": rng.random(200).astype(np.float32) * 10,
        })
        c.create_table("f", df)
        out = c.sql("select k, sum(x), min(x), max(x) from f group by k")
        g = df.groupby("k")["x"].agg(["sum", "min", "max"])
        np.testing.assert_allclose(out[:, 1], g["sum"].to_numpy(), rtol=1e-5)
        np.testing.assert_allclose(out[:, 2], g["min"].to_numpy(), rtol=1e-6)
        np.testing.assert_allclose(out[:, 3], g["max"].to_numpy(), rtol=1e-6)

    def test_order_by_aggregate(self, rng):
        c = Context()
        df = pd.DataFrame({
            "k": rng.integers(0, 8, 300).astype(np.int32),
            "v": rng.integers(1, 100, 300).astype(np.int32),
        })
        c.create_table("t", df)
        out = c.sql("select k, sum(v) from t group by k order by sum(v) desc")
        e = df.groupby("k")["v"].sum().sort_values(
            ascending=False, kind="stable")
        np.testing.assert_array_equal(out[:, 1], e.to_numpy())


class TestOffset:
    def test_limit_offset(self, rng):
        c = Context()
        df = pd.DataFrame({
            "k": rng.integers(0, 1000, 300).astype(np.int32),
            "v": rng.integers(0, 9, 300).astype(np.int32),
        })
        c.create_table("t", df)
        out = c.sql("select k from t order by k limit 10 offset 5")
        e = np.sort(df.k.to_numpy())[5:15]
        np.testing.assert_array_equal(out[:, 0], e)

    def test_offset_alone_preserves_row_order(self, rng):
        c = Context()
        df = pd.DataFrame({"a": np.arange(50, dtype=np.int32)})
        c.create_table("t", df)
        out = c.sql("select a from t offset 47")
        np.testing.assert_array_equal(out[:, 0], [47, 48, 49])

    def test_offset_past_end_is_empty(self):
        c = Context()
        c.create_table("t", pd.DataFrame({"a": np.arange(5, dtype=np.int32)}))
        assert c.sql("select a from t offset 99").shape[0] == 0

    def test_offset_with_groupby(self, rng):
        c = Context()
        df = pd.DataFrame({
            "k": rng.integers(0, 20, 400).astype(np.int32),
            "v": rng.integers(0, 9, 400).astype(np.int32),
        })
        c.create_table("t", df)
        out = c.sql("select k, sum(v) from t group by k order by k "
                    "limit 5 offset 3")
        e = df.groupby("k")["v"].sum().reset_index().to_numpy()[3:8]
        np.testing.assert_array_equal(out, e)

    def test_offset_in_explain(self):
        c = Context()
        c.create_table("t", pd.DataFrame({"a": np.arange(5, dtype=np.int32)}))
        assert "Offset 2" in c.explain("select a from t limit 1 offset 2")


class TestIntDivisionByZero:
    """Pinned engine semantics: no trap inside jit — XLA defines
    x / 0 == -1 and x % 0 == x for int32 (plan/expr.py docstring).
    Rows with nonzero divisors must still match the pandas oracle."""

    def test_div_by_zero_column(self):
        c = Context()
        df = pd.DataFrame({
            "a": np.array([10, -7, 9, 5], np.int32),
            "b": np.array([2, 0, 0, -2], np.int32),
        })
        c.create_table("t", df)
        out = c.sql("select a / b, a % b from t")
        np.testing.assert_array_equal(out[:, 0], [5, -1, -1, -2])
        np.testing.assert_array_equal(out[:, 1], [0, -7, 9, 1])

    def test_nonzero_rows_match_pandas(self, rng):
        c = Context()
        a = rng.integers(-100, 100, 100).astype(np.int32)
        b = rng.integers(-5, 6, 100).astype(np.int32)
        df = pd.DataFrame({"a": a, "b": b})
        c.create_table("t", df)
        out = c.sql("select a / b from t where b != 0")
        m = b != 0
        expect = np.trunc(a[m] / b[m]).astype(np.int32)   # C trunc division
        np.testing.assert_array_equal(out[:, 0], expect)

    def test_float_div_by_zero_is_inf(self):
        c = Context()
        df = pd.DataFrame({"x": np.array([1.0, -1.0, 0.0], np.float32)})
        c.create_table("t", df)
        out = c.sql("select x / 0.0 from t")
        assert np.isinf(out[0, 0]) and out[0, 0] > 0
        assert np.isinf(out[1, 0]) and out[1, 0] < 0
        assert np.isnan(out[2, 0])
