"""Every shipped experiment config must BUILD its full training model.

Drift guard between options/*.yml and the code: a renamed key, a changed
loss-builder signature, or a channel-derivation regression in any of the
10 reference-parity configs fails here, not when a user submits the job.
(The variant semantics are covered by tests/test_model_variants.py on
tiny networks; this builds the PRODUCTION-sized models the YAMLs declare,
so it also pins that the real 64-feat/23-block shapes construct.)
"""

import glob
import json
import os

import jax
import pytest
import yaml

OPTIONS_DIR = os.path.join(os.path.dirname(__file__), "..", "options")
TRAIN_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(OPTIONS_DIR, "*.yml"))
    if "infer" not in os.path.basename(p)
)


@pytest.mark.parametrize(
    "path", TRAIN_CONFIGS, ids=[os.path.basename(p) for p in TRAIN_CONFIGS])
def test_shipped_config_builds_model(path, tmp_path):
    opt = yaml.safe_load(open(path))
    assert "model_type" in opt, "experiment config without model_type"

    opt.update(is_train=True, dist=False, rank=0, world_size=1)
    opt.setdefault("manual_seed", 1)
    opt["num_gpu"] = 1

    train_ds = (opt.get("datasets") or {}).get("train") or {}
    if train_ds.get("osm_objs_path"):
        # the OSM model loads the json at init; the shipped path points at
        # the (absent) dataset tree
        j = tmp_path / "osm.json"
        j.write_text(json.dumps({"chip": {"building": [[1, 2, 10, 12]]}}))
        train_ds["osm_objs_path"] = str(j)
        opt["datasets"]["train"] = train_ds

    from satlas_sr_tpu.models import build_model

    model = build_model(opt)

    # the full production state exists: generator params + (GAN) D params
    nets = model.network_checkpoints()
    assert "g" in nets
    n_params = sum(int(x.size) for x in jax.tree.leaves(nets["g"]["params"]))
    assert n_params > 1000
    if opt["model_type"] != "L2Model":
        assert "d" in nets
        g_opt = opt["network_g"]
        if g_opt["type"] == "SSR_RRDBNet" and g_opt.get("num_block") == 23:
            # the real esrgan generator is ~16.7M params at 64/23/32
            assert 15_000_000 < n_params < 20_000_000

    # one lr schedule per optimizer, reading the YAML's milestones
    lrs = model.get_current_learning_rate()
    assert lrs and all(l > 0 for l in lrs)
