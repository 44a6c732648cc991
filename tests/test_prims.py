"""Unit tests for the segmented/compaction primitive layer.

Golden cases mirror the reference's primitive test suite
(``futhark/lib/.../segmented_tests.fut``) — same inputs/outputs, including the
empty-input and zero-length-segment edge cases — plus property tests against
numpy oracles on random data.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from harkdb_tpu.prims import (
    compact,
    compact_batch,
    compact_indices,
    expand,
    replicated_iota,
    segmented_iota,
    segmented_reduce,
    segmented_scan,
)
from harkdb_tpu.columnar.batch import ColumnBatch


def arr(x, dtype=jnp.int32):
    return jnp.asarray(x, dtype=dtype)


class TestSegmentedScan:
    def test_golden(self):
        # segmented_tests.fut:14-15: flags [T,F,F,T,F,F,T,F,F], values 1..9
        # → [1,3,6,4,9,15,7,15,24]
        flags = arr([1, 0, 0, 1, 0, 0, 1, 0, 0], jnp.bool_)
        vals = arr([1, 2, 3, 4, 5, 6, 7, 8, 9])
        out = segmented_scan(jnp.add, 0, flags, vals)
        np.testing.assert_array_equal(out, [1, 3, 6, 4, 9, 15, 7, 15, 24])

    def test_single_segment(self):
        flags = arr([1, 0, 0, 0], jnp.bool_)
        vals = arr([2, 2, 2, 2])
        np.testing.assert_array_equal(
            segmented_scan(jnp.add, 0, flags, vals), [2, 4, 6, 8]
        )

    def test_max_op(self):
        flags = arr([1, 0, 1, 0], jnp.bool_)
        vals = arr([3, 1, -5, -2])
        out = segmented_scan(jnp.maximum, jnp.iinfo(jnp.int32).min, flags, vals)
        np.testing.assert_array_equal(out, [3, 3, -5, -2])

    def test_random_vs_numpy(self, rng):
        n = 1000
        vals = rng.integers(-50, 50, n).astype(np.int32)
        flags = rng.random(n) < 0.1
        flags[0] = True
        out = np.asarray(
            segmented_scan(jnp.add, 0, jnp.asarray(flags), jnp.asarray(vals))
        )
        expect = np.zeros(n, np.int32)
        acc = 0
        for i in range(n):
            acc = vals[i] if flags[i] else acc + vals[i]
            expect[i] = acc
        np.testing.assert_array_equal(out, expect)


class TestSegmentedReduce:
    def test_golden(self):
        # segmented_tests.fut:24-25: same segments → [6, 15, 24]
        flags = arr([1, 0, 0, 1, 0, 0, 1, 0, 0], jnp.bool_)
        vals = arr([1, 2, 3, 4, 5, 6, 7, 8, 9])
        out, n = segmented_reduce(jnp.add, 0, flags, vals)
        assert int(n) == 3
        np.testing.assert_array_equal(np.asarray(out)[:3], [6, 15, 24])

    def test_unflagged_first_element_opens_segment(self):
        flags = arr([0, 0, 1, 0], jnp.bool_)
        vals = arr([1, 2, 10, 20])
        out, n = segmented_reduce(jnp.add, 0, flags, vals)
        assert int(n) == 2
        np.testing.assert_array_equal(np.asarray(out)[:2], [3, 30])

    def test_padding_ignored(self):
        flags = arr([1, 0, 1, 0, 1, 0], jnp.bool_)
        vals = arr([1, 2, 3, 4, 99, 99])
        out, n = segmented_reduce(jnp.add, 0, flags, vals, n_valid=jnp.int32(4))
        assert int(n) == 2
        np.testing.assert_array_equal(np.asarray(out)[:2], [3, 7])

    def test_empty(self):
        flags = arr([1, 0], jnp.bool_)
        vals = arr([5, 5])
        out, n = segmented_reduce(jnp.add, 0, flags, vals, n_valid=jnp.int32(0))
        assert int(n) == 0

    def test_random_vs_numpy(self, rng):
        n = 512
        vals = rng.integers(0, 100, n).astype(np.int32)
        flags = rng.random(n) < 0.15
        out, k = segmented_reduce(
            jnp.add, 0, jnp.asarray(flags), jnp.asarray(vals)
        )
        f = flags.copy()
        f[0] = True
        seg_ids = np.cumsum(f.astype(np.int64)) - 1
        expect = np.zeros(seg_ids[-1] + 1, np.int32)
        np.add.at(expect, seg_ids, vals)
        assert int(k) == len(expect)
        np.testing.assert_array_equal(np.asarray(out)[: int(k)], expect)


class TestReplicatedIota:
    def test_golden(self):
        # segmented_tests.fut:36-37: [2,3,1] → [0,0,1,1,1,2]
        ids, total = replicated_iota(arr([2, 3, 1]), out_capacity=8)
        assert int(total) == 6
        np.testing.assert_array_equal(np.asarray(ids)[:6], [0, 0, 1, 1, 1, 2])

    def test_zero_length_segments(self):
        # empty segments must be skipped: [2,0,1] → [0,0,2]
        ids, total = replicated_iota(arr([2, 0, 1]), out_capacity=4)
        assert int(total) == 3
        np.testing.assert_array_equal(np.asarray(ids)[:3], [0, 0, 2])

    def test_leading_zero(self):
        ids, total = replicated_iota(arr([0, 0, 3]), out_capacity=4)
        assert int(total) == 3
        np.testing.assert_array_equal(np.asarray(ids)[:3], [2, 2, 2])

    def test_all_empty(self):
        ids, total = replicated_iota(arr([0, 0, 0]), out_capacity=4)
        assert int(total) == 0

    def test_capacity_truncation(self):
        # sum(reps) > out_capacity: the documented truncation case. The
        # prefix that fits must still be exact (scatter indices stay
        # monotone — overflowing offsets clamp to the capacity sentinel).
        ids, total = replicated_iota(
            arr([2, 3, 4]), out_capacity=4, n_valid=jnp.int32(2)
        )
        assert int(total) == 5
        np.testing.assert_array_equal(np.asarray(ids), [0, 0, 1, 1])

    def test_truncation_with_invalid_tail(self):
        # Valid rows overflow capacity while invalid rows follow — the
        # regression shape for the sorted-scatter contract.
        ids, total = replicated_iota(
            arr([3, 3, 7, 9]), out_capacity=4, n_valid=jnp.int32(3)
        )
        assert int(total) == 13
        np.testing.assert_array_equal(np.asarray(ids), [0, 0, 0, 1])


class TestSegmentedIota:
    def test_golden(self):
        # segmented_tests.fut:47-48: flags [T,F,F,T,F,T] → [0,1,2,0,1,0]
        flags = arr([1, 0, 0, 1, 0, 1], jnp.bool_)
        np.testing.assert_array_equal(segmented_iota(flags), [0, 1, 2, 0, 1, 0])


class TestExpand:
    def test_golden(self):
        # expand (sz=2*x) (get x i = x*i) over [1,2,3]:
        # sizes [2,4,6]; row x emits x*0..x*(2x-1)
        # → [0,1, 0,2,4,6, 0,3,6,9,12,15]  (segmented_tests.fut:55-63 contract)
        src = arr([1, 2, 3])
        sizes = 2 * src

        def get(src_ids, local):
            return src[src_ids] * local

        out, total = expand(sizes, get, out_capacity=16)
        assert int(total) == 12
        np.testing.assert_array_equal(
            np.asarray(out)[:12], [0, 1, 0, 2, 4, 6, 0, 3, 6, 9, 12, 15]
        )

    def test_with_empty_rows(self):
        src = arr([5, 7, 9])
        sizes = arr([2, 0, 1])

        def get(src_ids, local):
            return src[src_ids] + local

        out, total = expand(sizes, get, out_capacity=8)
        assert int(total) == 3
        np.testing.assert_array_equal(np.asarray(out)[:3], [5, 6, 9])


class TestCompaction:
    def test_basic(self):
        mask = arr([0, 1, 1, 0, 1, 0], jnp.bool_)
        idx, count = compact_indices(mask)
        assert int(count) == 3
        np.testing.assert_array_equal(np.asarray(idx)[:3], [1, 2, 4])

    def test_compact_values(self):
        vals = arr([10, 11, 12, 13, 14, 15])
        mask = arr([1, 0, 0, 1, 0, 1], jnp.bool_)
        out, count = compact(vals, mask)
        assert int(count) == 3
        np.testing.assert_array_equal(np.asarray(out)[:3], [10, 13, 15])

    def test_respects_n_valid(self):
        mask = arr([1, 1, 1, 1], jnp.bool_)
        idx, count = compact_indices(mask, n_valid=jnp.int32(2))
        assert int(count) == 2

    def test_none_survive(self):
        mask = arr([0, 0, 0], jnp.bool_)
        _, count = compact_indices(mask)
        assert int(count) == 0

    def test_batch(self):
        batch = ColumnBatch.from_numpy(
            {"a": np.array([1, 2, 3, 4], np.int32),
             "b": np.array([10, 20, 30, 40], np.int32)}
        )
        out = compact_batch(batch, arr([0, 1, 0, 1], jnp.bool_))
        assert int(out.n_valid) == 2
        np.testing.assert_array_equal(np.asarray(out.column("a"))[:2], [2, 4])
        np.testing.assert_array_equal(np.asarray(out.column("b"))[:2], [20, 40])

    def test_stable_order_random(self, rng):
        n = 2048
        vals = rng.integers(0, 1000, n).astype(np.int32)
        mask = rng.random(n) < 0.4
        out, count = compact(jnp.asarray(vals), jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(out)[: int(count)], vals[mask])


class TestExpandReduce:
    def test_golden(self):
        # segmented_tests.fut expand_reduce contract: sizes [2,4,6] from
        # src [1,2,3], get x i = x*i, op (+), ne 0 → per-row sums
        # row1: 0+1=1; row2: 0+2+4+6=12; row3: 0+3+6+9+12+15=45
        src = arr([1, 2, 3])
        sizes = 2 * src

        def get(src_ids, local):
            return src[src_ids] * local

        from harkdb_tpu.prims import expand_reduce
        out, n = expand_reduce(sizes, get, jnp.add, 0, out_capacity=16)
        np.testing.assert_array_equal(np.asarray(out)[:3], [1, 12, 45])

    def test_zero_sizes_yield_ne(self):
        from harkdb_tpu.prims import expand_reduce
        sizes = arr([2, 0, 1])
        vals = arr([5, 7, 9])

        def get(src_ids, local):
            return vals[src_ids]

        out, n = expand_reduce(sizes, get, jnp.add, 0, out_capacity=8)
        np.testing.assert_array_equal(np.asarray(out)[:3], [10, 0, 9])

    def test_max_op_fallback(self):
        from harkdb_tpu.prims import expand_outer_reduce
        sizes = arr([3, 2])
        def get(src_ids, local):
            return (src_ids + 1) * 10 + local
        out, n = expand_outer_reduce(
            sizes, get, jnp.maximum, jnp.iinfo(jnp.int32).min,
            out_capacity=8,
        )
        np.testing.assert_array_equal(np.asarray(out)[:2], [12, 21])
