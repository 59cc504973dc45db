"""Toolchain gate for the tiny-batch XLA:TPU worker fault (VERDICT r4 #6).

The composed program "small ELL-gather aggregation + two large-table row
gathers in one jit" deterministically kills the v5e TPU worker at ~1.4K-row
shapes (docs/XLA_TINYBATCH_BUG.md; 40-line repro
`scripts/probes/tinybatch_repro.py vrpull_fwdonly`).  The shipped
mitigation routes `adj_format=auto` train batches below 4096 rows to COO
(`tests/test_spmm_loader.py::TestAutoFormatGate` pins the threshold).

This test runs the repro on the real chip in a subprocess and EXPECTS the
crash.  The moment a jax/jaxlib/libtpu bump fixes the fault upstream, the
repro comes back CLEAN and this test FAILS LOUDLY with instructions to
relax the auto-COO gate — the same run-on-every-toolchain-bump pattern as
`scripts/probes/mosaic_reprobe.py` for the Mosaic gather gap.

Full tier only (needs the attached TPU; smoke tests run on the CPU mesh).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPRO = os.path.join(REPO, "scripts", "probes", "tinybatch_repro.py")

# Substrings that identify the KNOWN fault signature (vs an unrelated
# failure, which must fail this test with the full output).
FAULT_MARKS = (
    "TPU device error", "kernel fault", "UNAVAILABLE", "ABORTED",
    "TPU backend error", "DataLoss",
)


def _tpu_env():
    """Subprocess env with the pytest CPU pin removed so the default
    (axon/TPU) platform selection applies."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.full
def test_tinybatch_fault_still_present():
    env = _tpu_env()
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print('BACKEND=' + jax.default_backend())"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    if "BACKEND=tpu" not in probe.stdout:
        pytest.skip(f"no TPU backend reachable from a subprocess "
                    f"(got: {probe.stdout.strip()!r})")

    try:
        pr = subprocess.run(
            [sys.executable, REPRO, "vrpull_fwdonly"],
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        # a worker crash can wedge the runtime rather than raise — the
        # bisection driver counts a hang as the fault; so do we
        return

    out = pr.stdout + pr.stderr
    if pr.returncode == 0 and "CLEAN" in pr.stdout:
        pytest.fail(
            "tinybatch repro (vrpull_fwdonly) ran CLEAN on this toolchain — "
            "the XLA:TPU tiny-batch fault appears FIXED upstream.  Action: "
            "re-run `python scripts/probes/tinybatch_repro.py driver` to "
            "confirm (2 reps per variant), then relax the <4096-row auto-COO "
            "gate (incagg_gnn_tpu/loader.py adj_format=auto policy + "
            "tests/test_spmm_loader.py::TestAutoFormatGate), update "
            "docs/XLA_TINYBATCH_BUG.md Status, and flip this test to assert "
            "CLEAN.")
    if any(m in out for m in FAULT_MARKS):
        return  # the known fault, still present — gate stays on
    pytest.fail(
        f"repro failed for an UNRECOGNIZED reason (rc={pr.returncode}) — "
        f"not the known TPU fault signature.  Output tail:\n"
        + "\n".join(out.strip().splitlines()[-15:]))
