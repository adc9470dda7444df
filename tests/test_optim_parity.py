"""Optimizer + LR-schedule parity against torch/basicsr semantics.

The reference trains with torch.optim.Adam + torch MultiStepLR stepped once
per iteration before the update (basicsr BaseModel.update_learning_rate),
with an optional linear warmup override. These pin:

- the milestone-decay sequence (exact match to torch MultiStepLR),
- the warmup ramp (basicsr: lr_i = base * i / warmup for i < warmup, with
  i the 1-based iteration = optax count + 1),
- Adam's weight_decay, which in torch is L2-INTO-GRADIENT (moments see
  grad + wd*param) — NOT AdamW's decoupled decay.

Note: after warmup ends, basicsr's override leaves the torch param-group lr
stuck at base*(warmup-1)/warmup until the next milestone (MultiStepLR only
rescales at milestones). Every shipped reference config sets warmup_iter: -1
(no warmup), so this framework returns to the full base lr instead of
reproducing that stuck value.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from satlas_sr_tpu.models.base import build_optimizer, multistep_lr


def _torch_lr_sequence(base, milestones, gamma, n_iters, warmup=-1):
    """basicsr update_learning_rate loop: the lr each iteration trains with."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=milestones,
                                                 gamma=gamma)
    lrs = []
    for i in range(1, n_iters + 1):
        if i > 1:
            sched.step()
        lr = opt.param_groups[0]["lr"]
        if i < warmup:
            lr = base * i / warmup
            opt.param_groups[0]["lr"] = lr  # basicsr _set_lr
        lrs.append(lr)
    return lrs


def test_multistep_lr_matches_torch_exactly():
    base, milestones, gamma = 2e-4, [15, 25], 0.5
    sched = multistep_lr(base, milestones, gamma, warmup_iter=-1)
    want = _torch_lr_sequence(base, milestones, gamma, 40)
    # the i-th update reads the schedule at optax count i-1
    got = [float(sched(i - 1)) for i in range(1, 41)]
    np.testing.assert_allclose(got, want, rtol=1e-7)


def _basicsr_restart_lr_sequence(base, milestones, gamma, restarts, weights,
                                 steps):
    """Stateful oracle replicating basicsr MultiStepRestartLR.get_lr: a
    restart epoch resets lr to base*weight (milestone decays forgotten); a
    milestone epoch multiplies the running lr by gamma^count."""
    from collections import Counter

    ms = Counter(milestones)
    lr = base
    out = []
    for epoch in range(steps):
        if epoch in restarts:
            lr = base * weights[restarts.index(epoch)]
        elif epoch in ms:
            lr = lr * gamma ** ms[epoch]
        out.append(lr)
    return out


def test_multistep_restart_lr_matches_basicsr_oracle():
    base, gamma = 1e-4, 0.5
    milestones = [10, 20, 35, 50]
    restarts, weights = [0, 25, 40], [1.0, 0.5, 0.25]
    sched = multistep_lr(base, milestones, gamma, warmup_iter=-1,
                         restarts=restarts, restart_weights=weights)
    want = _basicsr_restart_lr_sequence(base, milestones, gamma, restarts,
                                        weights, 60)
    got = [float(sched(e)) for e in range(60)]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # defaults reduce exactly to plain MultiStepLR
    plain = multistep_lr(base, milestones, gamma)
    restart_default = multistep_lr(base, milestones, gamma,
                                   restarts=[0], restart_weights=[1])
    for e in range(60):
        assert float(plain(e)) == float(restart_default(e))


def test_multistep_restart_lr_validates_pairing():
    with pytest.raises(ValueError, match="must pair up"):
        multistep_lr(1e-4, [10], 0.5, restarts=[0, 5],
                     restart_weights=[1.0])


def test_warmup_ramp_matches_basicsr_formula():
    base, warmup = 1e-3, 10
    sched = multistep_lr(base, [], 0.5, warmup_iter=warmup)
    for i in range(1, warmup):
        assert np.isclose(float(sched(i - 1)), base * i / warmup), i
    # first update must NOT run at lr=0 (count-without-+1 bug)
    assert float(sched(0)) > 0
    # post-warmup: full base lr (see module docstring for the basicsr quirk
    # this deliberately does not reproduce; no shipped config warms up)
    assert np.isclose(float(sched(warmup)), base)


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_adam_weight_decay_matches_torch_trajectory(wd):
    """Minimize 0.5*||p||^2 for 20 steps: torch.optim.Adam(weight_decay=wd)
    and build_optimizer must produce the same parameter trajectory."""
    base, betas = 1e-2, (0.9, 0.99)
    p0 = np.array([0.7, -1.3, 2.1], np.float32)

    p_t = torch.nn.Parameter(torch.tensor(p0))
    opt_t = torch.optim.Adam([p_t], lr=base, betas=betas, weight_decay=wd)
    for _ in range(20):
        opt_t.zero_grad()
        (0.5 * (p_t ** 2).sum()).backward()
        opt_t.step()

    tx = build_optimizer(
        {"type": "Adam", "lr": base, "betas": list(betas), "weight_decay": wd},
        lambda step: base)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for _ in range(20):
        grads = params  # d/dp 0.5*p^2
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), p_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adamw_type_stays_decoupled():
    # type: AdamW keeps optax.adamw (decoupled) — the L2-into-grad fixup is
    # Adam-only, matching torch's two distinct optimizers.
    base, wd = 1e-2, 0.01
    p0 = np.array([0.5, -0.9], np.float32)
    p_t = torch.nn.Parameter(torch.tensor(p0))
    opt_t = torch.optim.AdamW([p_t], lr=base, betas=(0.9, 0.99), weight_decay=wd)
    for _ in range(10):
        opt_t.zero_grad()
        (0.5 * (p_t ** 2).sum()).backward()
        opt_t.step()

    tx = build_optimizer(
        {"type": "AdamW", "lr": base, "betas": [0.9, 0.99], "weight_decay": wd},
        lambda step: base)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for _ in range(10):
        updates, state = tx.update(params, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), p_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
