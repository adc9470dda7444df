"""Unit tests for the learning-evidence PSNR gate (scripts/train_evidence.py).

Round 5: the round-4 verdict flagged the gate as loose — a strict `>` with
no noise margin would pass on +0.001 dB jitter. These tests pin the
margin-aware semantics so the gate cannot silently regress to that.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from train_evidence import _last_iter, _psnr_gate  # noqa: E402


def test_jitter_rise_fails():
    # the exact failure mode the round-4 verdict described
    rise, fit, ok = _psnr_gate([(100, 20.000), (200, 20.001), (300, 20.001)],
                               0.05)
    assert ok is False and rise < 0.05 and fit < 0.05


def test_real_rise_passes_pointwise():
    rise, fit, ok = _psnr_gate([(100, 20.0), (200, 20.08), (300, 20.15)], 0.05)
    assert ok is True and rise >= 0.05


def test_noisy_endpoint_rescued_by_fit():
    # monotone learning with one unlucky final validation: the trajectory
    # fit clears the margin even though the endpoints alone don't
    pts = [(100, 20.00), (200, 20.10), (300, 20.16), (400, 20.04)]
    rise, fit, ok = _psnr_gate(pts, 0.05)
    assert rise < 0.05 and fit >= 0.05 and ok is True


def test_decline_fails_both_ways():
    rise, fit, ok = _psnr_gate([(100, 20.2), (200, 20.1), (300, 20.0)], 0.05)
    assert ok is False and rise < 0 and fit < 0


def test_too_few_points_is_inconclusive():
    assert _psnr_gate([(100, 20.0)], 0.05) == (None, None, None)
    assert _psnr_gate([], 0.05) == (None, None, None)


def test_last_iter_counts_validation_rows(tmp_path):
    """A completed run whose total_iter is not a print_freq multiple logs
    its final iter ONLY in the end-of-training validation row (train rows
    stop at the last print_freq multiple, e.g. 296 for freq 37 / total 300).
    Counting train rows alone failed a completed resume leg — the round-5
    first artifact's resumed_ok=false on both families."""
    p = tmp_path / "metrics.jsonl"
    p.write_text(
        '{"iter": 296, "l_g_pix": 0.1}\n'
        "not json\n"
        '{"iter": 300, "val_dataset": "validation", "psnr": 20.0}\n')
    assert _last_iter(str(p)) == 300
    assert _last_iter(str(tmp_path / "missing.jsonl")) == 0
