"""OSM discriminator parity: self-attention + object branch vs torch oracle."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from satlas_sr_tpu.archs import OSMObjDiscriminator, SelfAttentionBlock


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def _attn_torch(p, x):
    """torch oracle of SelfAttentionBlock (osm_obj_discriminator_arch.py:16-31)."""
    b, c, h, w = x.shape

    def conv1x1(name, t):
        wgt = torch.from_numpy(np.transpose(np.asarray(p[name]["kernel"]), (3, 2, 0, 1)))
        bias = torch.from_numpy(np.asarray(p[name]["bias"]))
        return F.conv2d(t, wgt, bias)

    q = conv1x1("query", x).view(b, -1, w * h).permute(0, 2, 1)
    k = conv1x1("key", x).view(b, -1, w * h)
    energy = torch.bmm(q, k)
    attention = torch.softmax(energy, dim=2)
    v = conv1x1("value", x).view(b, -1, w * h)
    out = torch.bmm(v, attention.permute(0, 2, 1)).view(b, c, h, w)
    gamma = float(np.asarray(p["gamma"])[0])
    return gamma * out + x


def test_self_attention_matches_torch(rng):
    c = 16
    block = SelfAttentionBlock(channels=c)
    x = rng.randn(2, c, 8, 8).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), _nhwc(x))
    # non-zero gamma so the attention path is exercised
    p = jax.device_get(variables["params"])
    p["gamma"] = np.asarray([0.7], np.float32)
    variables = {"params": p}
    y_jax = _nchw(block.apply(variables, _nhwc(x)))
    with torch.no_grad():
        y_t = _attn_torch(p, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y_jax, y_t, atol=1e-5, rtol=1e-4)


def test_osm_object_branch_matches_torch(rng):
    """Object branch: 4 stride-2 convs + relu + 2 attention blocks."""
    model = OSMObjDiscriminator(num_in_ch=3, num_feat=4)
    x_img = jnp.zeros((1, 32, 32, 3))
    objs = rng.randn(2, 3, 32, 32).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x_img, _nhwc(objs))
    p = jax.device_get(variables["params"])
    # give the attention gammas non-zero values
    p["o_attention1"]["gamma"] = np.asarray([0.5], np.float32)
    p["o_attention2"]["gamma"] = np.asarray([-0.3], np.float32)
    variables = {"params": p, "spectral": variables["spectral"]}

    _, obj_logits = model.apply(variables, x_img, _nhwc(objs))
    obj_jax = _nchw(obj_logits)

    def conv_s2(name, t):
        w = torch.from_numpy(np.transpose(np.asarray(p[name]["kernel"]), (3, 2, 0, 1)))
        b = torch.from_numpy(np.asarray(p[name]["bias"]))
        return F.conv2d(t, w, b, stride=2, padding=1)

    with torch.no_grad():
        t = torch.from_numpy(objs)
        t = torch.relu(conv_s2("o_conv1", t))
        t = torch.relu(conv_s2("o_conv2", t))
        t = _attn_torch(p["o_attention1"], t)
        t = torch.relu(conv_s2("o_conv3", t))
        t = _attn_torch(p["o_attention2"], t)
        t = torch.relu(conv_s2("o_conv4", t))
    np.testing.assert_allclose(obj_jax, t.numpy(), atol=1e-4, rtol=1e-3)
