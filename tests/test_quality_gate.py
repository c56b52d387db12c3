"""Quality regression gate (VERDICT r2 #5): the full pipeline must keep its
PSNR / mIoU floors — a silent kernel or gradient regression fails this test,
not just a number nobody reads.

The gate runs `scripts/quality_e2e.py` (AE -> 4-stage train -> render ->
eval through the shipped CLIs) at QUALITY_SCALE=0.1 (~9 min on an idle
multi-core CPU; ~45 min on this 1-core host).

Floors (recalibrated 2026-08-19): PSNR >= 19.5 dB and language
discriminability MARGIN >= 0.03. The margin (in-mask minus out-of-mask
relevancy, see quality_e2e.py) replaced thresholded mIoU as the
reduced-scale floor after round 4 measured mIoU swinging 0.08 <-> 0.51
between runs whose renders correlate 0.9999: at this scale the eval's
adaptive threshold sits on a knife-edge, and the training outcome itself
is chaotic under float-level perturbation (densify decisions bifurcate —
wire-format A/B arms with bit-identical per-camera batches landed at
margins 0.51 / 0.12). A regressed kernel/gradient gives margin ~0 and
PSNR <15 dB; healthy runs measured 0.12-0.51. mIoU floors still gate the
full-scale run (scale >= 1.0), where the object is large enough for the
threshold to be stable.

Opt-in: run with QUALITY_GATE=1 pytest tests/test_quality_gate.py
(CI/driver runs keep the fast suite; the gate is exercised per-round before
PERF/QUALITY updates land).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.getenv("QUALITY_GATE"),
                    reason="9-minute e2e gate; set QUALITY_GATE=1 to run")
def test_quality_floors():
    env = dict(os.environ,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"),
               QUALITY_SCALE="0.1",
               QUALITY_PSNR_FLOOR="19.5",
               # reduced-scale mIoU is a knife-edge (module docstring) —
               # the margin floor is the real language-health gate here
               QUALITY_MIOU_FLOOR="0.0",
               QUALITY_MARGIN_FLOOR="0.03")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "quality_e2e.py"),
         "/tmp/quality_gate_suite"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, (
        f"quality gate failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
