"""Unit tests for the dtype-equivalence verdict (scripts/dtype_train_equiv.py).

Round 5: the first l2-family artifact said WITHIN BAR while its float32 leg
had NaN'd mid-run (the pre-fix SSIM precision instability) — flat val rows
from before the divergence matched the bf16 leg's and no gate looked at the
loss trajectory. These tests pin the finiteness disqualification so the
verdict can never again pass a diverged run.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from dtype_train_equiv import equivalence_verdict  # noqa: E402


def _section(psnr_last, finite=True, steady=0.1):
    return {
        "loss_finite": finite,
        "steady_iter_seconds": steady,
        "val_psnr": [{"iter": 150, "psnr": psnr_last - 0.01},
                     {"iter": 300, "psnr": psnr_last}],
    }


def test_within_bar_passes():
    ok, delta, speedup = equivalence_verdict(
        {"float32": _section(20.50, steady=0.14),
         "bfloat16": _section(20.52, steady=0.10)}, bar=0.05)
    assert ok is True
    assert abs(delta - 0.02) < 1e-9
    assert abs(speedup - 1.4) < 1e-9


def test_delta_over_bar_fails():
    ok, delta, _ = equivalence_verdict(
        {"float32": _section(20.50), "bfloat16": _section(20.60)}, bar=0.05)
    assert ok is False and abs(delta - 0.10) < 1e-9


def test_nan_loss_disqualifies_even_with_matching_val():
    # the exact round-5 failure: equal flat val rows, diverged f32 loss
    ok, delta, speedup = equivalence_verdict(
        {"float32": _section(5.635, finite=False),
         "bfloat16": _section(5.635)}, bar=0.05)
    assert ok is False and delta is None and speedup is None


def test_error_section_disqualifies():
    ok, delta, _ = equivalence_verdict(
        {"float32": {"error": "train CLI exited 1"},
         "bfloat16": _section(20.5)}, bar=0.05)
    assert ok is False and delta is None


def test_missing_val_rows_fail_not_pass():
    s = _section(20.5)
    empty = dict(s, val_psnr=[])
    ok, delta, _ = equivalence_verdict(
        {"float32": empty, "bfloat16": s}, bar=0.05)
    assert ok is False and delta is None
