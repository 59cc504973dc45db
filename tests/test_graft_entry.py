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

        g.dryrun_multichip(4)
