"""CI gate for the REAL-prior (wide-spectrum) covariance algebra path.

VERDICT r2 item 5: ``dct_diagonal_noinfo`` (flat prior) never exercises the
ill-conditioned algebra that the shipped dct_variance prior does. This test
drives the teacher-forced A/B against the torch reference with a synthetic
8-decade DCT prior under float64 (jax_enable_x64) with matched CG budgets
(stall off, last-iterate CG, same rtol clamp) and shared denoiser outputs,
and asserts the provable invariants:

* covariance-state parity at the probe floor over the whole schedule,
* exact agreement of converged solves (the final call),
* identical CG iteration counts for converged solves.

Runs in a SUBPROCESS because jax_enable_x64 is process-global and would
contaminate the rest of the suite.

Reference: conditioning_utils/online_update_bfgs.py:153-312,
conditioning_mechanisms.py:385-417.
"""
import json
import os
import subprocess
import sys

import pytest

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_x64_synthetic_prior_teacher_forced(tmp_path):
    out = tmp_path / "ab_x64.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single CPU device is enough and faster
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_reference_pipeline.py"),
         "--res", "32", "--channels", "32", "--steps", "3", "--mode", "teacher",
         "--precision", "f64", "--share_net", "--basis", "dct_synthetic",
         "--out", str(out)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, \
        f"A/B failed\nstdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    d = json.load(open(out))["teacher_forced"]
    assert d["agree"] is True
    # state parity at the probe floor through the ill-conditioned prior
    assert d["covariance_state_rel_err"]["max"] < 1e-4
    # converged solves agree exactly
    assert d["per_call_errors"][-1] < 1e-6
    # converged solves take the same number of CG iterations on both sides
    it = d["per_call_cg_iters"]
    assert it["ours"][-1] == it["reference"][-1]
