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

    def test_virtual_device_fallback_from_bare_env(self):
        """The driver calls dryrun_multichip WITHOUT the conftest env
        overrides — after jax has already initialized whatever platform
        wins by default (the axon TPU plugin here: 1 device).  The
        fallback must materialize the virtual CPU mesh post-init; it was
        silently dead until r5 (``jax.extend`` not auto-imported, and
        XLA_FLAGS is init-time only)."""
        import subprocess

        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        code = (
            "import jax\n"
            "jax.devices()  # init the default backend first, driver-style\n"
            "import __graft_entry__ as g\n"
            "g._ensure_virtual_devices(8)\n"
            "assert len(jax.devices()) >= 8, jax.devices()\n"
            "assert jax.default_backend() == 'cpu'\n"
            "print('FALLBACK_OK')\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0 and "FALLBACK_OK" in r.stdout, (
            r.stdout, r.stderr[-2000:])
