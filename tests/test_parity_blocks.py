"""Block-level parity: spectral-norm power iteration + ConvTranspose vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from satlas_sr_tpu.ops.spectral_norm import SNConv
from satlas_sr_tpu.archs.blocks import ConvTransposeBlock


def test_spectral_norm_power_iteration_matches_torch(rng):
    """One training-mode forward: same u/v update and normalised output."""
    in_ch, out_ch = 4, 6
    conv_t = torch.nn.Conv2d(in_ch, out_ch, 3, 1, 1, bias=False)
    with torch.no_grad():
        conv_t.weight.copy_(torch.from_numpy(rng.randn(out_ch, in_ch, 3, 3).astype(np.float32)))
    sn_t = torch.nn.utils.spectral_norm(conv_t)

    model = SNConv(out_ch, (3, 3), (1, 1), 1, use_bias=False)
    x = rng.randn(1, in_ch, 8, 8).astype(np.float32)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), x_j)
    # Inject torch's initial weight/u/v into our variables.
    # NB: .numpy() aliases torch storage and jax CPU device_put can be
    # zero-copy, so copy explicitly before torch mutates u/v in place.
    sd = {k: np.array(v.numpy()) for k, v in sn_t.state_dict().items()}
    variables = {
        "params": {"kernel": jnp.asarray(np.transpose(sd["weight_orig"], (2, 3, 1, 0)))},
        "spectral": {"u": jnp.asarray(sd["weight_u"]),
                     "v": jnp.asarray(sd["weight_v"])},
    }

    # torch training-mode forward runs one power iteration then convolves
    sn_t.train()
    with torch.no_grad():
        y_t = sn_t(torch.from_numpy(x)).numpy()
    u_t = sn_t.state_dict()["weight_u"].numpy()
    v_t = sn_t.state_dict()["weight_v"].numpy()

    y_j, mut = model.apply(variables, x_j, update_stats=True, mutable=["spectral"])
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(mut["spectral"]["u"]), u_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["spectral"]["v"]), v_t, atol=1e-5)
    np.testing.assert_allclose(y_j, y_t, atol=1e-5, rtol=1e-4)

    # Second forward (stats updated) still matches.
    with torch.no_grad():
        y_t2 = sn_t(torch.from_numpy(x)).numpy()
    variables2 = {"params": variables["params"], "spectral": mut["spectral"]}
    y_j2, _ = model.apply(variables2, x_j, update_stats=True, mutable=["spectral"])
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_j2), (0, 3, 1, 2)), y_t2, atol=1e-5, rtol=1e-4
    )


def test_conv_transpose_block_matches_torch(rng):
    feats, out = 4, 3
    block = ConvTransposeBlock(feats, out, kernel_size=3, sr_kernel_size=3, zoom_factor=2)
    x = rng.randn(1, feats, 8, 8).astype(np.float32)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = block.init(jax.random.PRNGKey(0), x_j)
    y_j = np.transpose(np.asarray(block.apply(variables, x_j)), (0, 3, 1, 2))

    p = variables["params"]
    # our deconv kernel is (kh, kw, out, in) for lax.conv_transpose with
    # transpose_kernel=True; torch ConvTranspose2d wants (in, out, kh, kw)
    w_deconv = np.transpose(np.asarray(p["deconv_kernel"]), (3, 2, 0, 1))

    def prelu(name, t):
        return F.prelu(t, torch.from_numpy(np.asarray(p[name]["weight"])))

    def refl_conv(name, t, k):
        pad = (k - 1) // 2
        t = F.pad(t, (pad, k - 1 - pad, pad, k - 1 - pad), mode="reflect")
        w = torch.from_numpy(np.transpose(np.asarray(p[name]["kernel"]), (3, 2, 0, 1)))
        b = torch.from_numpy(np.asarray(p[name]["bias"]))
        return F.conv2d(t, w, b)

    with torch.no_grad():
        t = F.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w_deconv),
            torch.from_numpy(np.asarray(p["deconv_bias"])), stride=2,
        )
        t = prelu("prelu1", t)
        t = refl_conv("conv1", t, 3)
        t = prelu("prelu2", t)
        t = refl_conv("conv2", t, 3)
        t = prelu("prelu3", t)
    # torch: out = (in-1)*stride + k = 17
    assert y_j.shape == (1, out, 17, 17)
    np.testing.assert_allclose(y_j, t.numpy(), atol=1e-5, rtol=1e-4)
