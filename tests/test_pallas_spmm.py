"""Pallas ELL kernels vs the XLA hybrid path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from incagg_gnn_tpu.graph.csr import CSRGraph
from incagg_gnn_tpu.ops.ell import build_hybrid_adj, spmm_hybrid
from incagg_gnn_tpu.ops.pallas_spmm import pallas_ell_reduce, pallas_spmm_ell_vmem


@pytest.fixture
def small_graph(rng):
    n = 512
    row = rng.integers(0, n, 4000)
    col = rng.integers(0, n, 4000)
    val = rng.random(4000).astype(np.float32)
    g = CSRGraph.from_coo(row, col, n, val)
    return g, n


class TestPallasEll:
    def test_vmem_spmm_matches_hybrid(self, small_graph, rng):
        g, n = small_graph
        hyb = build_hybrid_adj(g.rowptr, g.col, g.value, n, n, k=16)
        x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
        # kernel covers the ELL core only; add overflow via the XLA path
        want = spmm_hybrid(hyb._replace(
            ovf_vals=jnp.zeros_like(hyb.ovf_vals)), x)
        got = pallas_spmm_ell_vmem(hyb.ell_cols, hyb.ell_vals, x,
                                   block_rows=128, interpret=True)
        assert np.allclose(got, want, atol=1e-4)

    def test_reduce_matches_reference(self, rng):
        r, k, d = 256, 8, 128
        g = jnp.asarray(rng.standard_normal((r, k, d)).astype(np.float32))
        vals = jnp.asarray(rng.random((r, k)).astype(np.float32))
        want = (np.asarray(g) * np.asarray(vals)[..., None]).sum(axis=1)
        got = pallas_ell_reduce(g, vals, block_rows=128, interpret=True)
        assert np.allclose(got, want, atol=1e-4)
