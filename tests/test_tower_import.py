"""Real-weight importer round-trips (VERDICT r1 next #3).

For each state-dict naming convention the shipped configs can encounter —
OpenAI CLIP, open_clip SigLIP (timm trunk), bare timm, lpips-package
(vgg + alex), torchvision VGG19 — construct a synthetic torch checkpoint,
import it, and assert forward equality against an independent torch oracle
(torch.nn.MultiheadAttention / HF SiglipVisionModel / functional torch),
so the key mapping, transposes, qkv packing, activation and pooling semantics
are all proven before real weights land.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp


def _t(rng, *shape, scale=0.2):
    return torch.from_numpy((rng.randn(*shape) * scale).astype(np.float32))


# -- OpenAI CLIP -----------------------------------------------------------------


def _openai_state(rng, w=32, layers=2, patch=8, n_patches=16, embed=16):
    mlp = 4 * w
    state = {
        "visual.conv1.weight": _t(rng, w, 3, patch, patch),
        "visual.class_embedding": _t(rng, w),
        "visual.positional_embedding": _t(rng, n_patches + 1, w),
        "visual.ln_pre.weight": 1 + _t(rng, w, scale=0.05),
        "visual.ln_pre.bias": _t(rng, w, scale=0.05),
        "visual.ln_post.weight": 1 + _t(rng, w, scale=0.05),
        "visual.ln_post.bias": _t(rng, w, scale=0.05),
        "visual.proj": _t(rng, w, embed),
    }
    for i in range(layers):
        b = f"visual.transformer.resblocks.{i}"
        state.update({
            f"{b}.ln_1.weight": 1 + _t(rng, w, scale=0.05),
            f"{b}.ln_1.bias": _t(rng, w, scale=0.05),
            f"{b}.attn.in_proj_weight": _t(rng, 3 * w, w),
            f"{b}.attn.in_proj_bias": _t(rng, 3 * w, scale=0.05),
            f"{b}.attn.out_proj.weight": _t(rng, w, w),
            f"{b}.attn.out_proj.bias": _t(rng, w, scale=0.05),
            f"{b}.ln_2.weight": 1 + _t(rng, w, scale=0.05),
            f"{b}.ln_2.bias": _t(rng, w, scale=0.05),
            f"{b}.mlp.c_fc.weight": _t(rng, mlp, w),
            f"{b}.mlp.c_fc.bias": _t(rng, mlp, scale=0.05),
            f"{b}.mlp.c_proj.weight": _t(rng, w, mlp),
            f"{b}.mlp.c_proj.bias": _t(rng, w, scale=0.05),
        })
    return state


@torch.no_grad()
def _openai_oracle(state, x_nchw, layers=2, heads=2, patch=8):
    """CLIP VisionTransformer.forward with torch's own MultiheadAttention."""
    w = state["visual.conv1.weight"].shape[0]
    x = F.conv2d(x_nchw, state["visual.conv1.weight"], stride=patch)
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)  # [b, n, w]
    cls = state["visual.class_embedding"].reshape(1, 1, w).expand(b, 1, w)
    x = torch.cat([cls, x], dim=1) + state["visual.positional_embedding"]
    x = F.layer_norm(x, (w,), state["visual.ln_pre.weight"], state["visual.ln_pre.bias"])
    for i in range(layers):
        base = f"visual.transformer.resblocks.{i}"
        y = F.layer_norm(x, (w,), state[f"{base}.ln_1.weight"], state[f"{base}.ln_1.bias"])
        mha = torch.nn.MultiheadAttention(w, heads, batch_first=True)
        mha.in_proj_weight.data = state[f"{base}.attn.in_proj_weight"]
        mha.in_proj_bias.data = state[f"{base}.attn.in_proj_bias"]
        mha.out_proj.weight.data = state[f"{base}.attn.out_proj.weight"]
        mha.out_proj.bias.data = state[f"{base}.attn.out_proj.bias"]
        y, _ = mha(y, y, y, need_weights=False)
        x = x + y
        y = F.layer_norm(x, (w,), state[f"{base}.ln_2.weight"], state[f"{base}.ln_2.bias"])
        y = y @ state[f"{base}.mlp.c_fc.weight"].T + state[f"{base}.mlp.c_fc.bias"]
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        y = y @ state[f"{base}.mlp.c_proj.weight"].T + state[f"{base}.mlp.c_proj.bias"]
        x = x + y
    x = F.layer_norm(x[:, 0], (w,), state["visual.ln_post.weight"],
                     state["visual.ln_post.bias"])
    return (x @ state["visual.proj"]).numpy()


def test_openai_clip_import_forward_equality(tmp_path, rng):
    from satlas_sr_tpu.metrics.clip_encoder import MODEL_SPECS, load_vit_from_torch, _vit_encode

    state = _openai_state(rng)
    path = str(tmp_path / "openai_clip.pth")
    torch.save(state, path)

    spec = MODEL_SPECS["test-tiny-openai"]
    params = load_vit_from_torch(path, spec)
    assert params is not None and "cls" in params and "ln_pre" in params

    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    got = np.asarray(_vit_encode(
        {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v for k, v in
         __import__("jax").tree.map(jnp.asarray, params).items()}, spec, jnp.asarray(x)))
    want = _openai_oracle(state, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# -- open_clip SigLIP (timm trunk) vs HF SiglipVisionModel ------------------------


def _siglip_state_from_hf(hf_model, prefix="visual.trunk."):
    """Re-express an HF SiglipVisionModel's weights in open_clip/timm naming."""
    sd = hf_model.state_dict()
    g = lambda k: sd["vision_model." + k]
    w = g("embeddings.patch_embedding.weight").shape[0]
    out = {
        prefix + "patch_embed.proj.weight": g("embeddings.patch_embedding.weight"),
        prefix + "patch_embed.proj.bias": g("embeddings.patch_embedding.bias"),
        prefix + "pos_embed": g("embeddings.position_embedding.weight")[None],
        prefix + "norm.weight": g("post_layernorm.weight"),
        prefix + "norm.bias": g("post_layernorm.bias"),
        prefix + "attn_pool.latent": g("head.probe"),
        prefix + "attn_pool.q.weight": g("head.attention.in_proj_weight")[:w],
        prefix + "attn_pool.q.bias": g("head.attention.in_proj_bias")[:w],
        prefix + "attn_pool.kv.weight": g("head.attention.in_proj_weight")[w:],
        prefix + "attn_pool.kv.bias": g("head.attention.in_proj_bias")[w:],
        prefix + "attn_pool.proj.weight": g("head.attention.out_proj.weight"),
        prefix + "attn_pool.proj.bias": g("head.attention.out_proj.bias"),
        prefix + "attn_pool.norm.weight": g("head.layernorm.weight"),
        prefix + "attn_pool.norm.bias": g("head.layernorm.bias"),
        prefix + "attn_pool.mlp.fc1.weight": g("head.mlp.fc1.weight"),
        prefix + "attn_pool.mlp.fc1.bias": g("head.mlp.fc1.bias"),
        prefix + "attn_pool.mlp.fc2.weight": g("head.mlp.fc2.weight"),
        prefix + "attn_pool.mlp.fc2.bias": g("head.mlp.fc2.bias"),
    }
    i = 0
    while f"vision_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        b = f"encoder.layers.{i}"
        qkv_w = torch.cat([g(f"{b}.self_attn.q_proj.weight"),
                           g(f"{b}.self_attn.k_proj.weight"),
                           g(f"{b}.self_attn.v_proj.weight")], dim=0)
        qkv_b = torch.cat([g(f"{b}.self_attn.q_proj.bias"),
                           g(f"{b}.self_attn.k_proj.bias"),
                           g(f"{b}.self_attn.v_proj.bias")], dim=0)
        out.update({
            prefix + f"blocks.{i}.norm1.weight": g(f"{b}.layer_norm1.weight"),
            prefix + f"blocks.{i}.norm1.bias": g(f"{b}.layer_norm1.bias"),
            prefix + f"blocks.{i}.attn.qkv.weight": qkv_w,
            prefix + f"blocks.{i}.attn.qkv.bias": qkv_b,
            prefix + f"blocks.{i}.attn.proj.weight": g(f"{b}.self_attn.out_proj.weight"),
            prefix + f"blocks.{i}.attn.proj.bias": g(f"{b}.self_attn.out_proj.bias"),
            prefix + f"blocks.{i}.norm2.weight": g(f"{b}.layer_norm2.weight"),
            prefix + f"blocks.{i}.norm2.bias": g(f"{b}.layer_norm2.bias"),
            prefix + f"blocks.{i}.mlp.fc1.weight": g(f"{b}.mlp.fc1.weight"),
            prefix + f"blocks.{i}.mlp.fc1.bias": g(f"{b}.mlp.fc1.bias"),
            prefix + f"blocks.{i}.mlp.fc2.weight": g(f"{b}.mlp.fc2.weight"),
            prefix + f"blocks.{i}.mlp.fc2.bias": g(f"{b}.mlp.fc2.bias"),
        })
        i += 1
    return out


@pytest.mark.parametrize("prefix", ["visual.trunk.", ""])
def test_siglip_import_matches_hf_oracle(tmp_path, rng, prefix):
    """Import a SigLIP tower (open_clip `visual.trunk.` and bare timm naming)
    and match Hugging Face's SiglipVisionModel forward exactly."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from satlas_sr_tpu.metrics.clip_encoder import MODEL_SPECS, load_vit_from_torch, _vit_encode

    torch.manual_seed(0)
    cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        hidden_act="gelu", layer_norm_eps=1e-6,  # timm ViTs use exact GELU
    )
    hf = SiglipVisionModel(cfg).eval()
    state = _siglip_state_from_hf(hf, prefix=prefix)
    path = str(tmp_path / "siglip.pth")
    torch.save(state, path)

    spec = MODEL_SPECS["test-tiny-siglip"]
    params = load_vit_from_torch(path, spec)
    assert params is not None and "attn_pool" in params

    import jax
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    got = np.asarray(_vit_encode(jax.tree.map(jnp.asarray, params), spec, jnp.asarray(x)))
    with torch.no_grad():
        want = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).pooler_output.numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_clipscore_pretrained_with_siglip_weights(tmp_path, rng):
    """End to end: CLIPScore reports a pretrained (untagged) tower once an
    open_clip SigLIP checkpoint lands (shipped config's tower naming)."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from satlas_sr_tpu.metrics import clipscore

    torch.manual_seed(1)
    cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=2,
                             image_size=32, patch_size=8, hidden_act="gelu",
                             layer_norm_eps=1e-6)
    state = _siglip_state_from_hf(SiglipVisionModel(cfg).eval())
    path = str(tmp_path / "siglip_tower.pth")
    torch.save(state, path)

    assert clipscore.tower_pretrained("test-tiny-siglip", clip_weights_path=path)
    a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    s = clipscore.calculate_clipscore(a, a, clip_model="test-tiny-siglip",
                                      clip_weights_path=path)
    assert abs(s - 1.0) < 1e-4  # identical images -> cosine 1


# -- lpips package (vgg + alex) ----------------------------------------------------


_TV_ALEX_IDX = [0, 3, 6, 8, 10]
_TV_VGG16_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _lpips_state(rng, flavor):
    if flavor == "alex":
        shapes = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
        idxs, lin_ch = _TV_ALEX_IDX, [64, 192, 384, 256, 256]
    else:
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        shapes, in_ch = [], 3
        for c in chans:
            shapes.append((c, in_ch, 3))
            in_ch = c
        idxs, lin_ch = _TV_VGG16_IDX, [64, 128, 256, 512, 512]
    state = {}
    for (o, i, k), idx in zip(shapes, idxs):
        state[f"features.{idx}.weight"] = _t(rng, o, i, k, k, scale=np.sqrt(2.0 / (k * k * i)))
        state[f"features.{idx}.bias"] = _t(rng, o, scale=0.01)
    for li, c in enumerate(lin_ch):
        state[f"lin{li}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
    return state


@torch.no_grad()
def _lpips_oracle(state, flavor, a01, b01):
    """The lpips package's forward, functionally: scaling layer, backbone
    relu taps, channel-unit-normalize, squared diff, 1x1 lin head, spatial
    mean, sum over taps (lpips/lpips.py semantics)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    if flavor == "alex":
        idxs = _TV_ALEX_IDX
        pools_after = {0, 1}  # pool after relu1, relu2
        convargs = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]
        taps = set(range(5))
    else:
        idxs = _TV_VGG16_IDX
        pools_after = {1, 3, 6, 9}
        convargs = [(1, 1)] * 13
        taps = {1, 3, 6, 9, 12}

    def feats(x):
        # normalize=False path: the [0,1] input hits the scaling layer raw
        # (the reference never sets normalize=True — see metrics/lpips.py)
        h = (x - shift) / scale
        out = []
        for ci, idx in enumerate(idxs):
            s, p = convargs[ci]
            h = F.conv2d(h, state[f"features.{idx}.weight"],
                         state[f"features.{idx}.bias"], stride=s, padding=p)
            h = F.relu(h)
            if ci in taps:
                out.append(h)
            if ci in pools_after:
                k = 3 if flavor == "alex" else 2
                h = F.max_pool2d(h, k, stride=2)
        return out

    fa, fb = feats(a01), feats(b01)
    total = torch.zeros(a01.shape[0])
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt(torch.sum(xa**2, dim=1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt(torch.sum(xb**2, dim=1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        lin = state[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))
    return total.numpy()


@pytest.mark.parametrize("flavor", ["vgg", "alex"])
def test_lpips_import_forward_equality(tmp_path, rng, flavor):
    from satlas_sr_tpu.metrics.lpips import calculate_lpips, tower_pretrained

    state = _lpips_state(rng, flavor)
    path = str(tmp_path / f"lpips_{flavor}.pth")
    torch.save(state, path)
    assert tower_pretrained(lpips_model=flavor, lpips_weights_path=path)

    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + (rng.rand(64, 64, 3) * 40 - 20).astype(np.int32),
                0, 255).astype(np.uint8)
    got = calculate_lpips(a, b, lpips_model=flavor, lpips_weights_path=path)
    want = _lpips_oracle(
        state, flavor,
        torch.from_numpy(a.transpose(2, 0, 1)[None].astype(np.float32) / 255.0),
        torch.from_numpy(b.transpose(2, 0, 1)[None].astype(np.float32) / 255.0),
    )[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


# -- torchvision VGG19 (perceptual loss tower) ------------------------------------


def test_vgg19_import_forward_equality(tmp_path, rng):
    from satlas_sr_tpu.losses.vgg import (IMAGENET_MEAN, IMAGENET_STD, VGG19_PLAN,
                                          _TORCHVISION_CONV_IDX, load_vgg19_from_torch,
                                          vgg19_features)

    state = {}
    in_ch = 3
    for item, idx in zip([i for i in VGG19_PLAN if i != "M"], _TORCHVISION_CONV_IDX):
        _, out_ch = item
        state[f"features.{idx}.weight"] = _t(rng, out_ch, in_ch, 3, 3,
                                             scale=np.sqrt(2.0 / (9 * in_ch)))
        state[f"features.{idx}.bias"] = _t(rng, out_ch, scale=0.01)
        in_ch = out_ch
    path = str(tmp_path / "vgg19.pth")
    torch.save(state, path)

    params = load_vgg19_from_torch(path)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    taps = ["conv1_2", "conv2_2", "conv3_4", "conv4_4", "conv5_4"]
    got = vgg19_features(
        {k: {n: jnp.asarray(v) for n, v in p.items()} for k, p in params.items()},
        jnp.asarray(x), taps, use_input_norm=True)

    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        h = (h - mean) / std
        want = {}
        ci = 0
        for item in VGG19_PLAN:
            if item == "M":
                h = F.max_pool2d(h, 2, stride=2)
                continue
            name, _ = item
            idx = _TORCHVISION_CONV_IDX[ci]
            h = F.conv2d(h, state[f"features.{idx}.weight"],
                         state[f"features.{idx}.bias"], padding=1)
            if name in taps:
                want[name] = h.numpy()
            h = F.relu(h)
            ci += 1
    for name in taps:
        np.testing.assert_allclose(
            np.asarray(got[name]).transpose(0, 3, 1, 2), want[name],
            rtol=3e-4, atol=3e-5)


# -- OpenAI CLIP RN50 (ModifiedResNet) ---------------------------------------------


def _rn_state(rng, width=4, layers=(1, 1, 1, 1), embed=16, image=32):
    state = {}

    def conv(key, i, o, k):
        state[f"{key}.weight"] = _t(rng, o, i, k, k, scale=np.sqrt(2.0 / (k * k * i)))

    def bn(key, c):
        state[f"{key}.weight"] = 1 + _t(rng, c, scale=0.1)
        state[f"{key}.bias"] = _t(rng, c, scale=0.1)
        state[f"{key}.running_mean"] = _t(rng, c, scale=0.1)
        state[f"{key}.running_var"] = 1 + torch.from_numpy(
            np.abs(rng.randn(c) * 0.1).astype(np.float32))

    conv("visual.conv1", 3, width // 2, 3); bn("visual.bn1", width // 2)
    conv("visual.conv2", width // 2, width // 2, 3); bn("visual.bn2", width // 2)
    conv("visual.conv3", width // 2, width, 3); bn("visual.bn3", width)
    in_ch = width
    for si, (planes, n) in enumerate(zip([width, width * 2, width * 4, width * 8], layers)):
        for bi in range(n):
            base = f"visual.layer{si + 1}.{bi}"
            conv(f"{base}.conv1", in_ch, planes, 1); bn(f"{base}.bn1", planes)
            conv(f"{base}.conv2", planes, planes, 3); bn(f"{base}.bn2", planes)
            conv(f"{base}.conv3", planes, planes * 4, 1); bn(f"{base}.bn3", planes * 4)
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            if stride > 1 or in_ch != planes * 4:
                conv(f"{base}.downsample.0", in_ch, planes * 4, 1)
                bn(f"{base}.downsample.1", planes * 4)
            in_ch = planes * 4
    n_sp = (image // 32) ** 2
    state["visual.attnpool.positional_embedding"] = _t(rng, n_sp + 1, in_ch)
    for k, o in [("q_proj", in_ch), ("k_proj", in_ch), ("v_proj", in_ch), ("c_proj", embed)]:
        state[f"visual.attnpool.{k}.weight"] = _t(rng, o, in_ch, scale=1 / np.sqrt(in_ch))
        state[f"visual.attnpool.{k}.bias"] = _t(rng, o, scale=0.05)
    return state


@torch.no_grad()
def _rn_oracle(state, x_nchw, width=4, layers=(1, 1, 1, 1), heads=4):
    """CLIP model.py ModifiedResNet.forward, functionally."""
    def bn(x, key):
        return F.batch_norm(x, state[f"{key}.running_mean"], state[f"{key}.running_var"],
                            state[f"{key}.weight"], state[f"{key}.bias"],
                            training=False, eps=1e-5)

    x = F.relu(bn(F.conv2d(x_nchw, state["visual.conv1.weight"], stride=2, padding=1), "visual.bn1"))
    x = F.relu(bn(F.conv2d(x, state["visual.conv2.weight"], padding=1), "visual.bn2"))
    x = F.relu(bn(F.conv2d(x, state["visual.conv3.weight"], padding=1), "visual.bn3"))
    x = F.avg_pool2d(x, 2)
    for si, n in enumerate(layers):
        for bi in range(n):
            base = f"visual.layer{si + 1}.{bi}"
            stride = (2 if si > 0 else 1) if bi == 0 else 1
            out = F.relu(bn(F.conv2d(x, state[f"{base}.conv1.weight"]), f"{base}.bn1"))
            out = F.relu(bn(F.conv2d(out, state[f"{base}.conv2.weight"], padding=1), f"{base}.bn2"))
            if stride > 1:
                out = F.avg_pool2d(out, stride)
            out = bn(F.conv2d(out, state[f"{base}.conv3.weight"]), f"{base}.bn3")
            idn = x
            if f"{base}.downsample.0.weight" in state:
                if stride > 1:
                    idn = F.avg_pool2d(idn, stride)
                idn = bn(F.conv2d(idn, state[f"{base}.downsample.0.weight"]), f"{base}.downsample.1")
            x = F.relu(out + idn)
    c = x.shape[1]
    x = x.flatten(2).permute(2, 0, 1)  # (HW)NC
    x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
    x = x + state["visual.attnpool.positional_embedding"][:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=x[:1], key=x, value=x, embed_dim_to_check=c, num_heads=heads,
        in_proj_weight=None,
        in_proj_bias=torch.cat([state["visual.attnpool.q_proj.bias"],
                                state["visual.attnpool.k_proj.bias"],
                                state["visual.attnpool.v_proj.bias"]]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=state["visual.attnpool.c_proj.weight"],
        out_proj_bias=state["visual.attnpool.c_proj.bias"],
        use_separate_proj_weight=True,
        q_proj_weight=state["visual.attnpool.q_proj.weight"],
        k_proj_weight=state["visual.attnpool.k_proj.weight"],
        v_proj_weight=state["visual.attnpool.v_proj.weight"],
        training=False, need_weights=False)
    return out.squeeze(0).numpy()


def test_clip_rn50_import_forward_equality(tmp_path, rng):
    import jax

    from satlas_sr_tpu.metrics.clip_encoder import MODEL_SPECS, _import_clip_rn, _rn_encode

    state = _rn_state(rng)
    spec = MODEL_SPECS["test-tiny-rn"]
    params = _import_clip_rn(state, spec)
    assert params is not None

    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    params = jax.tree.map(
        lambda v: jnp.asarray(v) if isinstance(v, np.ndarray) else v, params)
    got = np.asarray(_rn_encode(params, spec, jnp.asarray(x)))
    want = _rn_oracle(state, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_rn50_encoder_builds_from_checkpoint_file(tmp_path, rng):
    from satlas_sr_tpu.metrics.clip_encoder import get_encoder

    state = _rn_state(rng)
    path = str(tmp_path / "rn50.pth")
    torch.save(state, path)
    encode, pretrained = get_encoder("test-tiny-rn", path)
    assert pretrained
    out = encode(jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)))
    assert out.shape == (1, 16) and np.isfinite(np.asarray(out)).all()


# -- timm Eva (EVA02-E-14-plus trunk, post-norm fused-qkv variant) ----------------


def _eva_state(rng, w=32, layers=2, patch=8, n_patches=16, embed=16,
               prefix="visual.trunk."):
    """timm Eva naming as shipped in open_clip EVA-CLIP checkpoints: fused
    bias-free qkv + separate q_bias/v_bias params (k bias is a zeros buffer,
    absent from the dict), post-norm blocks, classifier head = projection."""
    mlp = 4 * w
    state = {
        f"{prefix}patch_embed.proj.weight": _t(rng, w, 3, patch, patch),
        f"{prefix}patch_embed.proj.bias": _t(rng, w, scale=0.05),
        f"{prefix}cls_token": _t(rng, 1, 1, w),
        f"{prefix}pos_embed": _t(rng, 1, n_patches + 1, w),
        f"{prefix}norm.weight": 1 + _t(rng, w, scale=0.05),
        f"{prefix}norm.bias": _t(rng, w, scale=0.05),
        f"{prefix}head.weight": _t(rng, embed, w),
        f"{prefix}head.bias": _t(rng, embed, scale=0.05),
    }
    for i in range(layers):
        b = f"{prefix}blocks.{i}"
        state.update({
            f"{b}.norm1.weight": 1 + _t(rng, w, scale=0.05),
            f"{b}.norm1.bias": _t(rng, w, scale=0.05),
            f"{b}.attn.qkv.weight": _t(rng, 3 * w, w),
            f"{b}.attn.q_bias": _t(rng, w, scale=0.05),
            f"{b}.attn.v_bias": _t(rng, w, scale=0.05),
            f"{b}.attn.proj.weight": _t(rng, w, w),
            f"{b}.attn.proj.bias": _t(rng, w, scale=0.05),
            f"{b}.norm2.weight": 1 + _t(rng, w, scale=0.05),
            f"{b}.norm2.bias": _t(rng, w, scale=0.05),
            f"{b}.mlp.fc1.weight": _t(rng, mlp, w),
            f"{b}.mlp.fc1.bias": _t(rng, mlp, scale=0.05),
            f"{b}.mlp.fc2.weight": _t(rng, w, mlp),
            f"{b}.mlp.fc2.bias": _t(rng, w, scale=0.05),
        })
    return state


@torch.no_grad()
def _eva_oracle(state, x_nchw, layers=2, heads=2, patch=8,
                prefix="visual.trunk."):
    """timm Eva forward (use_post_norm=True, qkv_fused, global_pool='token'):
    x + norm1(attn(x)), x + norm2(mlp(x)), final norm, cls token, head."""
    g = lambda k: state[prefix + k]
    w = g("patch_embed.proj.weight").shape[0]
    d = w // heads
    eps = 1e-6
    x = F.conv2d(x_nchw, g("patch_embed.proj.weight"),
                 g("patch_embed.proj.bias"), stride=patch)
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    cls = g("cls_token").expand(b, 1, w)
    x = torch.cat([cls, x], dim=1) + g("pos_embed")
    n = x.shape[1]
    for i in range(layers):
        base = f"blocks.{i}"
        qkv_bias = torch.cat([g(f"{base}.attn.q_bias"),
                              torch.zeros(w), g(f"{base}.attn.v_bias")])
        qkv = (x @ g(f"{base}.attn.qkv.weight").T + qkv_bias)
        qkv = qkv.reshape(b, n, 3, heads, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax(q @ k.transpose(-2, -1) / d ** 0.5, dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, w)
        y = y @ g(f"{base}.attn.proj.weight").T + g(f"{base}.attn.proj.bias")
        x = x + F.layer_norm(y, (w,), g(f"{base}.norm1.weight"),
                             g(f"{base}.norm1.bias"), eps)
        y = x @ g(f"{base}.mlp.fc1.weight").T + g(f"{base}.mlp.fc1.bias")
        y = F.gelu(y) @ g(f"{base}.mlp.fc2.weight").T + g(f"{base}.mlp.fc2.bias")
        x = x + F.layer_norm(y, (w,), g(f"{base}.norm2.weight"),
                             g(f"{base}.norm2.bias"), eps)
    x = F.layer_norm(x, (w,), g("norm.weight"), g("norm.bias"), eps)[:, 0]
    return (x @ g("head.weight").T + g("head.bias")).numpy()


@pytest.mark.parametrize("prefix", ["visual.trunk.", ""])
def test_eva_import_forward_equality(tmp_path, rng, prefix):
    import jax

    from satlas_sr_tpu.metrics.clip_encoder import (
        MODEL_SPECS, _vit_encode, load_vit_from_torch)

    state = _eva_state(rng, prefix=prefix)
    path = str(tmp_path / "eva.pth")
    torch.save(state, path)

    spec = MODEL_SPECS["test-tiny-eva"]
    params = load_vit_from_torch(path, spec)
    assert params is not None and "cls" in params and "ln_pre" not in params

    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    got = np.asarray(_vit_encode(jax.tree.map(jnp.asarray, params), spec,
                                 jnp.asarray(x)))
    want = _eva_oracle(state, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       prefix=prefix)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_eva_swiglu_rope_variant_refused(tmp_path, rng):
    """eva02 B/L MIM trunks (SwiGLU + RoPE) must be refused loudly: RoPE has
    no params, so a silent import would yield wrong embeddings."""
    from satlas_sr_tpu.metrics.clip_encoder import (
        MODEL_SPECS, TowerImportError, load_vit_from_torch)

    state = _eva_state(rng)
    state["visual.trunk.blocks.0.mlp.fc1_g.weight"] = _t(rng, 64, 32)
    path = str(tmp_path / "eva02_l.pth")
    torch.save(state, path)
    with pytest.raises(TowerImportError, match="SwiGLU/RoPE"):
        load_vit_from_torch(path, MODEL_SPECS["test-tiny-eva"])


def test_eva02_spec_geometry():
    """The shipped EVA02-E-14-plus spec must be the real trunk geometry
    (timm eva02_enormous_patch14_clip_224), not a plain-ViT stand-in."""
    from satlas_sr_tpu.metrics.clip_encoder import MODEL_SPECS, _mlp_dim

    spec = MODEL_SPECS["EVA02-E-14-plus"]
    assert (spec.width, spec.layers, spec.heads) == (1792, 64, 16)
    assert spec.post_norm and spec.pool == "cls" and spec.ln_eps == 1e-6
    assert _mlp_dim(spec) == 15360 and spec.embed_dim == 1024


def test_provided_weights_never_silently_randomize(tmp_path, rng):
    """get_encoder must raise for a supplied weights file that is missing or
    matches no naming family — never degrade to the random tower
    (VERDICT r2 next #5)."""
    from satlas_sr_tpu.metrics.clip_encoder import TowerImportError, get_encoder

    with pytest.raises(TowerImportError, match="does not exist"):
        get_encoder("test-tiny", str(tmp_path / "nope.pth"))

    path = str(tmp_path / "garbage.pth")
    torch.save({"some.unrelated.weight": _t(rng, 4, 4)}, path)
    with pytest.raises(TowerImportError, match="no known naming family"):
        get_encoder("test-tiny", path)


# -- near-matching state dicts must raise, not crash or silently randomize --------


def test_near_matching_tower_raises_import_error(tmp_path, rng):
    """A checkpoint whose naming family is detected but whose layout doesn't
    map (e.g. an EVA-style attn split, or fewer blocks than the spec) must
    raise TowerImportError — not AttributeError mid-import, and not silently
    fall back to the random tower (VERDICT r2 code-review finding #2)."""
    from satlas_sr_tpu.metrics.clip_encoder import (
        MODEL_SPECS,
        TowerImportError,
        load_vit_from_torch,
    )

    spec = MODEL_SPECS["test-tiny-openai"]

    # family detected (visual.conv1 present) but blocks renamed EVA-style
    state = _openai_state(rng)
    for k in list(state):
        if ".attn.in_proj_weight" in k or ".attn.in_proj_bias" in k:
            state[k.replace("in_proj_weight", "q_proj.weight")
                   .replace("in_proj_bias", "q_proj.bias")] = state.pop(k)
    path = str(tmp_path / "eva_like.pth")
    torch.save(state, path)
    with pytest.raises(TowerImportError):
        load_vit_from_torch(path, spec)

    # fewer transformer blocks than the model spec expects
    state2 = _openai_state(rng, layers=1)
    path2 = str(tmp_path / "short.pth")
    torch.save(state2, path2)
    with pytest.raises(TowerImportError):
        load_vit_from_torch(path2, spec)
