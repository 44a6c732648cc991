"""Tests for columnar storage: ingest dispatch, Table surface, ColumnBatch."""

import os

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from harkdb_tpu.columnar.batch import ColumnBatch, align_capacity
from harkdb_tpu.columnar.ingest import load_table
from harkdb_tpu.columnar.table import Table
from harkdb_tpu.config import EngineConfig

CFG = EngineConfig()
DATA_CSV = os.path.join(os.path.dirname(__file__), "data", "data.csv")


class TestIngest:
    def test_dataframe(self):
        df = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]})
        cols, headers, _dicts = load_table(df, CFG)
        assert headers == ["a", "b"]
        assert cols["a"].dtype == np.int32
        assert cols["b"].dtype == np.float32
        np.testing.assert_array_equal(cols["a"], [1, 2, 3])

    def test_ndarray_autonames(self):
        # Reference table.py:12-16 autogenerates col1..colN.
        arr = np.arange(12).reshape(4, 3)
        cols, headers, _dicts = load_table(arr, CFG)
        assert headers == ["col1", "col2", "col3"]
        np.testing.assert_array_equal(cols["col2"], [1, 4, 7, 10])

    def test_csv(self):
        cols, headers, _dicts = load_table(DATA_CSV, CFG)
        assert headers == [f"col{i}" for i in range(1, 9)]
        np.testing.assert_array_equal(cols["col1"], [6, 0, 0, 0, 0, 6, 1])

    def test_dict(self):
        cols, headers, _dicts = load_table({"x": [1, 2], "y": [3.5, 4.5]}, CFG)
        assert headers == ["x", "y"]
        assert cols["y"].dtype == np.float32

    def test_bad_file_type(self):
        # Reference error contract table.py:40.
        with pytest.raises(Exception, match="do not support loading"):
            load_table("foo.xlsx", CFG)

    def test_bad_source_type(self):
        # Reference error contract table.py:50.
        with pytest.raises(Exception, match="not in a file"):
            load_table(42, CFG)


class TestTable:
    def test_surface(self):
        # Reference-compatible get_schema/get_data/get_name (table.py:64-81).
        t = Table("t", DATA_CSV, CFG)
        assert t.get_name() == "t"
        assert t.get_schema() == [f"col{i}" for i in range(1, 9)]
        data = t.get_data()
        assert data.shape == (7, 8)
        np.testing.assert_array_equal(data[6], [1, 2, 3, 4, 5, 3, 2, 1])

    def test_padding(self):
        t = Table("t", np.ones((10, 2), np.int32), CFG)
        assert t.n_rows == 10
        assert t.capacity == CFG.row_align
        assert t.batch().capacity == CFG.row_align
        assert int(t.batch().n_valid) == 10


class TestColumnBatch:
    def test_roundtrip(self):
        b = ColumnBatch.from_numpy(
            {"a": np.array([1, 2, 3], np.int32)}, capacity=8
        )
        assert b.capacity == 8
        mat, names = b.to_numpy()
        assert names == ["a"]
        np.testing.assert_array_equal(mat[:, 0], [1, 2, 3])

    def test_valid_mask(self):
        b = ColumnBatch.from_numpy({"a": np.zeros(3, np.int32)}, capacity=6)
        np.testing.assert_array_equal(
            b.valid_mask(), [True, True, True, False, False, False]
        )

    def test_pytree(self):
        import jax

        b = ColumnBatch.from_numpy({"a": np.array([1, 2], np.int32)})
        out = jax.jit(lambda x: ColumnBatch(
            {"a": x.column("a") * 2}, x.n_valid))(b)
        np.testing.assert_array_equal(np.asarray(out.column("a")), [2, 4])

    def test_align_capacity(self):
        assert align_capacity(0, 1024) == 1024
        assert align_capacity(1, 1024) == 1024
        assert align_capacity(1024, 1024) == 1024
        assert align_capacity(1025, 1024) == 2048
