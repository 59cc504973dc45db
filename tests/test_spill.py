"""Host-offload spill engine tests: async gather/scatter round-trips must
match the synchronous path (the equivalence test SURVEY §5.2 prescribes)."""

import numpy as np
import pytest

from incagg_gnn_tpu.history_spill import SpilledHistory, _load


class TestSpilledHistory:
    def test_pull_roundtrip(self, rng):
        h = SpilledHistory(1000, 32, pool_size=2, buffer_size=256)
        h.table[:] = rng.standard_normal((1001, 32)).astype(np.float32)
        idx = rng.choice(1000, 200, replace=False)
        h.async_pull(idx)
        out = np.asarray(h.synchronize_pull())
        h.free_pull()
        assert np.allclose(out, h.table[idx])

    def test_pipelined_pulls_fifo(self, rng):
        h = SpilledHistory(500, 16, pool_size=2, buffer_size=128)
        h.table[:] = rng.standard_normal((501, 16)).astype(np.float32)
        i1 = rng.choice(500, 100, replace=False)
        i2 = rng.choice(500, 50, replace=False)
        h.async_pull(i1)
        h.async_pull(i2)
        o1 = np.asarray(h.synchronize_pull())
        h.free_pull()
        o2 = np.asarray(h.synchronize_pull())
        h.free_pull()
        assert np.allclose(o1, h.table[i1])
        assert np.allclose(o2, h.table[i2])

    def test_push_chunks(self, rng):
        h = SpilledHistory(300, 8, pool_size=2, buffer_size=128)
        vals = rng.standard_normal((60, 8)).astype(np.float32)
        offset = np.array([10, 100, 250])
        count = np.array([20, 30, 10])
        h.async_push(vals, offset=offset, count=count)
        h.synchronize_push()
        s = 0
        for o, c in zip(offset, count):
            assert np.allclose(h.table[o:o + c], vals[s:s + c])
            s += c

    def test_push_indexed(self, rng):
        h = SpilledHistory(300, 8, pool_size=2, buffer_size=128)
        idx = rng.choice(300, 40, replace=False)
        vals = rng.standard_normal((40, 8)).astype(np.float32)
        h.async_push(vals, idx=idx)
        h.synchronize_push()
        assert np.allclose(h.table[idx], vals)

    def test_pull_after_push_sees_new_values(self, rng):
        h = SpilledHistory(100, 4, pool_size=2, buffer_size=64)
        vals = rng.standard_normal((10, 4)).astype(np.float32)
        idx = np.arange(10)
        h.async_push(vals, idx=idx)
        h.synchronize_push()
        h.async_pull(idx)
        out = np.asarray(h.synchronize_pull())
        h.free_pull()
        assert np.allclose(out, vals)

    def test_native_lib_present(self):
        # the C++ engine should build in this environment
        assert _load() is not None
