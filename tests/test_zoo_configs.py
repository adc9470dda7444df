"""options/zoo/: each released-checkpoint infer config builds its network.

Drift guard for the checkpoint-zoo configs (options/zoo/README.md): the
declared network must construct, accept the config's stacked input shape,
and keep num_in_ch consistent with n_lr_images.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest
import yaml

from satlas_sr_tpu.utils.model_utils import build_network, uses_3d_input

ZOO_DIR = os.path.join(os.path.dirname(__file__), "..", "options", "zoo")
ZOO_CONFIGS = sorted(glob.glob(os.path.join(ZOO_DIR, "*.yml")))


def test_zoo_covers_every_released_generator():
    names = {os.path.basename(p) for p in ZOO_CONFIGS}
    expected = {f"infer_esrgan_{n}S2.yml" for n in (1, 2, 4, 16)} | {
        "infer_srcnn.yml", "infer_highresnet.yml"} | {
        f"infer_esrgan_{b}.yml" for b in ("10m", "20m", "60m")}
    # 8S2 is the root infer_example.yml; the band variants (round 4) ship
    # marked EXPERIMENTAL, gated on scripts/band_order_search.py
    assert names == expected


@pytest.mark.parametrize(
    "path", ZOO_CONFIGS, ids=[os.path.basename(p) for p in ZOO_CONFIGS])
def test_zoo_config_network_builds_and_runs(path):
    opt = yaml.safe_load(open(path))
    n = int(opt["n_lr_images"])
    g = opt["network_g"]
    bands = opt.get("s2_bands") or ["tci"]
    cpf = 3 + (len(bands) - 1)  # tci is 3-channel, other bands 1
    if g["type"] == "SSR_RRDBNet":
        assert int(g["num_in_ch"]) == cpf * n
        assert "tci" in bands  # loaders force tci first; a tci-less list
        # cannot run through either pipeline (s2-naip_dataset.py:73-75)
    model = build_network(opt)
    shape = (1, n, 32, 32, 3) if uses_3d_input(g["type"]) \
        else (1, 32, 32, cpf * n)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    out = model.apply(variables, jnp.zeros(shape))
    assert out.shape[-3:] == (128, 128, 3)
    # the weights path pairs with a fetch-registry artifact
    from satlas_sr_tpu.fetch import REGISTRY

    stem = os.path.basename(opt["path"]["pretrain_network_g"])
    stem = stem.removesuffix(".pth").removesuffix("_s2naip")
    assert stem in REGISTRY
