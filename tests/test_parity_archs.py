"""Checkpoint-parity tests: JAX archs vs independent PyTorch oracles.

Each test: random-init the flax arch, export to torch-format state dict via
utils/torch_io, run the torch functional oracle, and compare outputs. This
pins conv padding, resize, spectral-norm, reflect-pad and PReLU semantics to
PyTorch's — the property that makes released .pth checkpoints load with
bit-comparable outputs (SURVEY.md §7 hard part (a)/(f)).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import RRDBNet, UNetDiscriminatorSN, SRCNN, HighResNet
from satlas_sr_tpu.utils import torch_io

from torch_oracles import (
    highresnet_forward,
    rrdbnet_forward,
    srcnn_forward,
    unet_disc_forward,
)


def _to_torch_sd(np_dict):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in np_dict.items()}


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _nchw(y_nhwc):
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


@pytest.mark.parametrize("scale", [4, 1, 2])
def test_rrdbnet_matches_torch(rng, scale):
    num_block = 2
    model = RRDBNet(num_in_ch=6, num_out_ch=3, scale=scale, num_feat=16,
                    num_block=num_block, num_grow_ch=8)
    h = 8 if scale == 4 else 16
    x = rng.randn(1, 6, h, h).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x))
    y_jax = _nchw(model.apply(variables, _nhwc(x)))

    sd = _to_torch_sd(torch_io.rrdbnet_to_torch(variables))
    with torch.no_grad():
        y_t = rrdbnet_forward(sd, torch.from_numpy(x), num_block, scale).numpy()
    assert y_t.shape == y_jax.shape
    np.testing.assert_allclose(y_jax, y_t, atol=2e-5, rtol=1e-4)


def test_rrdbnet_torch_roundtrip(rng):
    """import(export(params)) == params for the scanned trunk."""
    model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=16, num_block=3, num_grow_ch=8)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 6)))
    sd = torch_io.rrdbnet_to_torch(variables)
    back = torch_io.rrdbnet_from_torch(sd, num_block=3)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(back["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_discriminator_matches_torch(rng):
    model = UNetDiscriminatorSN(num_in_ch=3, num_feat=8)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x))
    # eval path: stored u/v, no power iteration
    y_jax = _nchw(model.apply(variables, _nhwc(x), update_stats=False))

    sd = _to_torch_sd(torch_io.unet_disc_to_torch(variables))
    with torch.no_grad():
        y_t = unet_disc_forward(sd, torch.from_numpy(x)).numpy()
    # Random-init SN weights give large activations; compare relatively.
    np.testing.assert_allclose(y_jax, y_t, rtol=2e-3)


def test_srcnn_matches_torch(rng):
    hidden, t, res_layers = 16, 4, 1
    model = SRCNN(in_channels=3, revisits=t, hidden_channels=hidden,
                  residual_layers=res_layers, output_size=32, zoom_factor=4,
                  sr_kernel_size=1)
    x = rng.randn(1, t, 3, 8, 8).astype(np.float32)
    x_jax = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), x_jax)
    y_jax = np.transpose(np.asarray(model.apply(variables, x_jax)), (0, 1, 4, 2, 3))

    sd = _to_torch_sd(torch_io.srcnn_to_torch(variables))
    with torch.no_grad():
        y_t = srcnn_forward(sd, torch.from_numpy(x), hidden, res_layers, 32, 4, 1).numpy()
    np.testing.assert_allclose(y_jax, y_t, atol=2e-5, rtol=1e-4)


def test_srcnn_torch_import_roundtrip(rng):
    model = SRCNN(in_channels=3, revisits=4, hidden_channels=16, residual_layers=1,
                  output_size=32, zoom_factor=4, sr_kernel_size=1)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 8, 8, 3)))
    sd = torch_io.srcnn_to_torch(variables)
    back = torch_io.srcnn_from_torch(sd, residual_layers=1)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(model.apply(variables, x)), np.asarray(model.apply(back, x))
    )


def test_highresnet_matches_torch(rng):
    hidden, t = 16, 4
    model = HighResNet(in_channels=3, revisits=t, hidden_channels=hidden,
                       residual_layers=1, output_size=32, zoom_factor=4,
                       sr_kernel_size=1)
    x = rng.randn(1, t, 3, 8, 8).astype(np.float32)
    x_jax = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), x_jax)
    y_jax = np.transpose(np.asarray(model.apply(variables, x_jax)), (0, 1, 4, 2, 3))

    # Export via srcnn pieces + fusion keys (shared FusionBlock level 0).
    p = variables["params"]
    out = {}
    from satlas_sr_tpu.utils.torch_io import _conv_back, _doubleconv_to_torch

    _doubleconv_to_torch(p["encoder"], out, "encoder.doubleconv2d")
    _doubleconv_to_torch(
        p["fusion"]["fuse"]["residual"]["body"], out,
        "fusion.fusion.0.fuse.0.residualblock.doubleconv2d",
    )
    _conv_back(p["fusion"]["fuse"]["proj"], out, "fusion.fusion.0.fuse.1")
    out["fusion.fusion.0.fuse.3.weight"] = np.asarray(p["fusion"]["fuse"]["prelu"]["weight"])
    _conv_back(p["sr"]["conv1"], out, "sr.upsample.1")
    out["sr.upsample.3.weight"] = np.asarray(p["sr"]["prelu1"]["weight"])
    _conv_back(p["sr"]["conv2"], out, "sr.upsample.4")
    out["sr.upsample.6.weight"] = np.asarray(p["sr"]["prelu2"]["weight"])

    sd = _to_torch_sd(out)
    with torch.no_grad():
        y_t = highresnet_forward(sd, torch.from_numpy(x), hidden, 32, 4, 1).numpy()
    np.testing.assert_allclose(y_jax, y_t, atol=2e-5, rtol=1e-4)

    # And the importer reproduces the same params.
    back = torch_io.highresnet_from_torch(out)
    y_back = np.asarray(model.apply(back, x_jax))
    np.testing.assert_array_equal(np.asarray(model.apply(variables, x_jax)), y_back)


@pytest.mark.parametrize("scale", [8, 16])
def test_rrdbnet_high_scales(rng, scale):
    """x8/x16 add conv_up3/conv_up4 stages (rrdbnet_arch.py:106-109,130-134)."""
    model = RRDBNet(num_in_ch=3, num_out_ch=3, scale=scale, num_feat=8,
                    num_block=1, num_grow_ch=4)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "conv_up3" in variables["params"]
    assert ("conv_up4" in variables["params"]) == (scale == 16)
    out = jax.eval_shape(lambda v, x: model.apply(v, x), variables, x)
    assert out.shape == (1, 8 * scale, 8 * scale, 3)
    # torch round trip covers the extra stages
    sd = torch_io.rrdbnet_to_torch(variables)
    assert f"conv_up3.weight" in sd
    back = torch_io.rrdbnet_from_torch(sd, num_block=1)
    y1 = model.apply(variables, jnp.ones((1, 8, 8, 3)))
    y2 = model.apply(back, jnp.ones((1, 8, 8, 3)))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_highresnet_torch_export_roundtrip(rng):
    """highresnet_to_torch inverts highresnet_from_torch (index-0 fusion
    names only: the reference shares ONE FusionBlock across recursion levels
    and torch state_dict dedups shared params to their first name)."""
    model = HighResNet(in_channels=3, revisits=4, hidden_channels=16,
                       residual_layers=1, output_size=32, zoom_factor=4,
                       sr_kernel_size=1)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = torch_io.export_torch_state("HighResNet", variables)
    assert "fusion.fusion.0.fuse.1.weight" in sd
    assert not any(k.startswith("fusion.fusion.1") for k in sd)
    back = torch_io.highresnet_from_torch(sd)
    np.testing.assert_array_equal(np.asarray(model.apply(variables, x)),
                                  np.asarray(model.apply(back, x)))


def test_osm_disc_torch_export_roundtrip(rng):
    from satlas_sr_tpu.archs.osm_discriminator import OSMObjDiscriminator

    model = OSMObjDiscriminator(num_in_ch=3, num_feat=4)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    objs = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, objs))
    sd = torch_io.export_torch_state("OSMObjDiscriminator", variables)
    # the wrapped U-Net's convs live at the torch top level, with spectral u/v
    assert "conv0.weight" in sd and "conv1.weight_orig" in sd
    assert "o_attention1.gamma" in sd
    back = torch_io.osm_disc_from_torch(sd)
    a = jax.tree.leaves({"p": variables["params"],
                         "s": variables.get("spectral", {})})
    b = jax.tree.leaves({"p": back["params"], "s": back.get("spectral", {})})
    assert len(a) == len(b)
    assert all(np.allclose(x_, y_) for x_, y_ in zip(a, b))


def test_export_torch_state_unknown_arch():
    with pytest.raises(KeyError, match="supported"):
        torch_io.export_torch_state("NotAnArch", {"params": {}})


def test_rrdbnet_remat_modes_match_baseline_grads(rng):
    """Round-4 bwd-traffic experiment machinery: every remat mode (block /
    rdb / conv_outs save-policy) must compute the same loss and gradients as
    the no-remat baseline — remat is a memory schedule, not a math change."""
    import jax
    import jax.numpy as jnp
    import pytest
    from satlas_sr_tpu.archs.rrdbnet import RRDBNet

    x = jnp.asarray(rng.rand(2, 32, 32, 6), jnp.float32)
    base = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=2,
                   num_grow_ch=4)
    variables = base.init(jax.random.PRNGKey(0), x)

    def loss_and_grad(model):
        def f(params):
            return jnp.mean(model.apply({"params": params}, x) ** 2)
        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = loss_and_grad(base)
    for mode in (True, "block", "rdb", "conv_outs"):
        model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=2,
                        num_grow_ch=4, remat=mode)
        l, g = loss_and_grad(model)
        assert abs(float(l - l0)) < 1e-6, mode
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=str(mode))

    bad = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=2,
                  num_grow_ch=4, remat="typo")
    with pytest.raises(ValueError, match="remat must be"):
        bad.init(jax.random.PRNGKey(0), x)
