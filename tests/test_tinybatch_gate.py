"""Toolchain gate for the tiny-batch XLA:TPU worker fault (VERDICT r4 #6).

Small ELL-gather aggregation composed with history-table gathers in one
jit kills the v5e TPU worker at ~1.4K-row shapes (docs/XLA_TINYBATCH_BUG.md).
The shipped mitigation routes `adj_format=auto` train batches below 4096
rows to COO (`tests/test_spmm_loader.py::TestAutoFormatGate` pins the
threshold).

This test runs the ORIGINAL crashing command — `main.py` on the arxiv-shape
SBM at 150 single-cluster parts with `adj_format=hybrid` forced — on the
real chip in a subprocess, and EXPECTS the device loss (main.py classifies
it and exits `DEVICE_LOSS_EXIT`).  The moment a jax/jaxlib/libtpu bump
fixes the fault, training completes and this test FAILS LOUDLY with
instructions to relax the auto-COO gate — the run-on-every-toolchain-bump
pattern of `scripts/probes/mosaic_reprobe.py`.

Why main.py and not the 40-line repro: the repro's closure-constant tables
no longer COMPILE through the remote-compile tunnel (HTTP 413), and the
argument-passing rewrite runs clean 200+ dispatches (r5 bisection fact:
table-operand form matters) — while the real trainer path still crashes
deterministically during epoch 0.  The gate guards the real path.

Full tier only (needs the attached TPU; smoke tests run on the CPU mesh).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEVICE_LOSS_EXIT = 23  # main.py's dedicated device-loss exit code

FAULT_MARKS = (
    "device loss", "TPU worker process crashed", "TPU device error",
    "kernel fault", "UNAVAILABLE", "ABORTED", "TPU backend error",
    "DataLoss",
)

CMD = [
    "main.py", "--model", "conf/model/gcn.yaml", "--dataset", "sbm-arxiv",
    "num_parts=150", "batch_size=1", "epochs=1", "vr_update=true",
    "adj_format=hybrid", "log_every=1000",
]


def _tpu_env():
    """Subprocess env with the pytest CPU pin removed so the default
    (axon/TPU) platform selection applies."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("INCAGG_PLATFORM", None)
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
            [sys.executable] + CMD,
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        # a worker crash can wedge the runtime rather than raise — count a
        # hang as the fault (the r4 bisection driver did the same)
        return

    out = pr.stdout + pr.stderr
    if pr.returncode == DEVICE_LOSS_EXIT or any(m in out
                                                for m in FAULT_MARKS):
        return  # the known fault, still present — gate stays on
    if pr.returncode == 0:
        pytest.fail(
            "the tiny-batch trigger command (main.py sbm-arxiv 150 parts "
            "adj_format=hybrid) completed CLEAN on this toolchain — the "
            "XLA:TPU fault appears FIXED upstream.  Action: re-run it "
            "2-3x to confirm, then relax the <4096-row auto-COO gate "
            "(incagg_gnn_tpu/loader.py adj_format=auto policy + "
            "tests/test_spmm_loader.py::TestAutoFormatGate), update "
            "docs/XLA_TINYBATCH_BUG.md Status, and flip this test to "
            "assert CLEAN.")
    pytest.fail(
        f"trigger command failed for an UNRECOGNIZED reason "
        f"(rc={pr.returncode}) — not the known TPU fault signature.  "
        f"Output tail:\n" + "\n".join(out.strip().splitlines()[-15:]))
