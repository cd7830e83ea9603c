"""CI guard for the full-pipeline reference A/B (VERDICT r1 #1): the
teacher-forced harness at 64px must keep every guidance call within tolerance
of the torch reference. The committed 256px artifact (docs/ab_reference_256.json)
is produced by the same code via scripts/ab_reference_pipeline.py."""
import os
import sys

import pytest

# heavyweight tier: torch oracles / e2e CLI / multi-process / full-model
# forwards — excluded from the <5 min fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_teacher_forced_pipeline_parity_64px():
    from ab_reference_pipeline import run_ab_teacher_forced
    out = run_ab_teacher_forced(res=64, channels=32, steps=4, verbose=False)
    assert out["protocol"]["guidance_calls"] == 7
    assert out["agree"], f"per-call errors: {out['per_call_errors']}"
    assert out["per_call_rel_err"]["max"] < 2e-2


def test_free_running_sr_pipeline_parity_64px():
    """Free-running super_resolution (bicubic x4) A/B: both frameworks run
    the full guided pipeline end to end and must agree on the user-facing
    metric (the 30-step artifact docs/ab_reference_64_sr_free.json agrees to
    PSNR 3e-6 dB; this CI guard runs 4 steps)."""
    from ab_reference_pipeline import run_ab
    out = run_ab(res=64, channels=32, steps=4, verbose=False,
                 operator="super_resolution")
    assert out["measurement_max_abs_err"] < 1e-3
    assert out["agree"], out["psnr_vs_cond"]
