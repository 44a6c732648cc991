"""Native C++ CSV loader tests (falls back to pandas when g++ unavailable)."""

import os

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu.config import EngineConfig
from harkdb_tpu.io.native_csv import native_read_csv, _load_lib

CFG = EngineConfig()
DATA_CSV = os.path.join(os.path.dirname(__file__), "data", "data.csv")

pytestmark = pytest.mark.skipif(
    _load_lib() is None, reason="native loader unavailable (no g++?)"
)


def test_reference_csv_matches_pandas():
    cols, names = native_read_csv(DATA_CSV, CFG)
    ref = pd.read_csv(DATA_CSV, skipinitialspace=True)
    assert names == list(ref.columns)
    for n in names:
        np.testing.assert_array_equal(
            cols[n], ref[n].to_numpy().astype(np.int32)
        )


def test_dtype_inference(tmp_path):
    p = tmp_path / "mix.csv"
    p.write_text("i,f\n1,1.5\n-2,2.5\n30,-0.25\n")
    cols, names = native_read_csv(str(p), CFG)
    assert names == ["i", "f"]
    assert cols["i"].dtype == np.int32
    assert cols["f"].dtype == np.float32
    np.testing.assert_array_equal(cols["i"], [1, -2, 30])
    np.testing.assert_allclose(cols["f"], [1.5, 2.5, -0.25])


def test_no_trailing_newline(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\n3,4")
    cols, _ = native_read_csv(str(p), CFG)
    np.testing.assert_array_equal(cols["a"], [1, 3])
    np.testing.assert_array_equal(cols["b"], [2, 4])


def test_scientific_notation(tmp_path):
    p = tmp_path / "e.csv"
    p.write_text("x\n1e3\n-2.5e-2\n1E2\n")
    cols, _ = native_read_csv(str(p), CFG)
    np.testing.assert_allclose(cols["x"], [1000.0, -0.025, 100.0])


def test_text_falls_back_to_pandas(tmp_path):
    p = tmp_path / "text.csv"
    p.write_text("a,b\n1,hello\n")
    assert native_read_csv(str(p), CFG) is None


def test_random_roundtrip_vs_pandas(tmp_path, rng):
    n = 5000
    df = pd.DataFrame({
        "a": rng.integers(-10**6, 10**6, n),
        "b": rng.random(n) * 100 - 50,
    })
    p = tmp_path / "r.csv"
    df.to_csv(p, index=False)
    cols, _ = native_read_csv(str(p), CFG)
    np.testing.assert_array_equal(cols["a"], df.a.to_numpy().astype(np.int32))
    np.testing.assert_allclose(
        cols["b"], df.b.to_numpy().astype(np.float32), rtol=2e-6, atol=1e-4
    )


def test_ingest_uses_native_transparently(tmp_path):
    from harkdb_tpu.columnar.ingest import load_csv

    p = tmp_path / "t.csv"
    p.write_text("x,y\n5,6\n7,8\n")
    cols, names, _dicts = load_csv(str(p), CFG)
    assert names == ["x", "y"]
    np.testing.assert_array_equal(cols["x"], [5, 7])
