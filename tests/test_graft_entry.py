"""Driver entry-point tests: trace entry() and execute the multi-chip dryrun."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    import __graft_entry__ as ge

    fn, example = ge.entry()
    out = jax.eval_shape(fn, *example)  # full trace without compiling 23 blocks
    assert out.shape == (8, 128, 128, 3)
    assert out.dtype == np.uint8


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
