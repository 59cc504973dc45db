"""Driver-contract tests for __graft_entry__ (compile-check + multichip dryrun)."""

import os
import sys

import jax
import pytest

pytestmark = pytest.mark.full

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestGraftEntry:
    def test_entry_jits(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.ndim == 2

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual mesh")
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        # 8 on the standard virtual mesh exercises the composed pod-slice
        # case (4x2 2-D mesh GAS + block tier + sharded checkpoint restore)
        g.dryrun_multichip(min(8, len(jax.devices())))
