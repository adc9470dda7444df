"""One-pass import dry-run for user-mounted pretrained tower weights.

The perceptual/CLIP/LPIPS towers run as loudly-warned seeded random networks
in this artifact-less environment; importers for every configured naming
family are built and oracle-tested (tests/test_tower_import.py). This script
exists so the FIRST session with real weights spends zero time debugging
importers: point it at a directory of .pth/.pt/.bin files and it reports,
per file, which tower families import, with parameter counts and a forward
fingerprint — in one pass.

    python scripts/tower_dryrun.py weights/
    python scripts/tower_dryrun.py weights/ --out TOWER_DRYRUN.json

Families tried per file (the same entry points the losses/metrics use):
  vgg19        losses/vgg.py torchvision VGG19 features
               (perceptual_opt, ssr/losses/basic_loss.py:26-34 parity)
  lpips-vgg    metrics/lpips.py lpips-package vgg checkpoint
  lpips-alex   metrics/lpips.py lpips-package alex checkpoint
  CLIP towers  metrics/clip_encoder.py — OpenAI CLIP visual, open_clip
               SigLIP visual.trunk, bare timm ViT, timm Eva, CLIP RN50;
               one attempt per --clip-models spec

Forward fingerprints run on a fixed seeded input so two sessions can
compare them; towers above --max-forward-params (EVA02-E is 4.4B) skip the
forward and fingerprint the parameter tree instead. Exit 0 when every file
imported as at least one family, 2 otherwise.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def _n_params(tree) -> int:
    import jax
    import numpy as np

    return int(sum(np.asarray(x).size for x in jax.tree.leaves(tree)
                   if hasattr(x, "size")))


def _fingerprint_array(arr) -> str:
    import numpy as np

    a = np.asarray(arr, np.float64).ravel()
    digest = hashlib.sha256(np.round(a, 4).tobytes()).hexdigest()[:12]
    return f"{digest} (mean {a.mean():+.5f}, std {a.std():.5f})"


def _fingerprint_tree(tree) -> str:
    import jax
    import numpy as np

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "size"):
            h.update(np.round(np.asarray(leaf, np.float64), 4).tobytes())
    return f"params:{h.hexdigest()[:12]}"


def _try_vgg19(path, state, max_fwd):
    from satlas_sr_tpu.losses.vgg import load_vgg19_from_torch, vgg19_features

    try:
        params = load_vgg19_from_torch(path)
    except Exception:  # noqa: BLE001 — not a vgg19 file
        return None
    n = _n_params(params)
    rec = {"tower": "vgg19", "n_params": n}
    if n <= max_fwd:
        import jax.numpy as jnp
        import numpy as np

        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                        jnp.float32)
        taps = vgg19_features(params, x, ["conv5_4"])
        rec["fingerprint"] = _fingerprint_array(taps["conv5_4"])
    else:
        rec["fingerprint"] = _fingerprint_tree(params)
    return rec


def _try_lpips(path, state, flavor, max_fwd):
    from satlas_sr_tpu.metrics.lpips import _PLANS, _load_lpips_torch

    try:
        loaded = _load_lpips_torch(path, _PLANS[flavor])
    except Exception:  # noqa: BLE001
        return None
    if loaded is None:
        return None
    convs, lins = loaded
    if not lins:  # a bare torchvision backbone is vgg19's business, not lpips
        return None
    rec = {"tower": f"lpips-{flavor}",
           "n_params": _n_params(convs) + _n_params(lins)}
    if rec["n_params"] <= max_fwd:
        import numpy as np

        from satlas_sr_tpu.metrics.lpips import calculate_lpips

        rng = np.random.RandomState(0)
        a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        d = calculate_lpips(a, b, lpips_model=flavor, lpips_weights_path=path)
        rec["fingerprint"] = f"lpips(a,b)={d:.6f}"
    else:
        rec["fingerprint"] = _fingerprint_tree(convs)
    return rec


def _try_clip(path, state, model_name, max_fwd):
    import jax.numpy as jnp
    import numpy as np

    from satlas_sr_tpu.metrics import clip_encoder as ce

    spec = ce.MODEL_SPECS[model_name]
    try:
        if isinstance(spec, ce.ResNetSpec):
            params = ce._import_clip_rn(state, spec)
        elif any(k.startswith("visual.conv1") for k in state):
            params = ce._import_openai_clip(state, spec)
        elif any(k.startswith("visual.trunk.patch_embed") for k in state):
            params = (ce._import_timm_eva(state, spec, "visual.trunk.")
                      if ce._is_eva_family(state, "visual.trunk.")
                      else ce._import_timm_vit(state, spec, "visual.trunk."))
        elif any(k.startswith("patch_embed.proj") for k in state):
            params = (ce._import_timm_eva(state, spec, "")
                      if ce._is_eva_family(state, "")
                      else ce._import_timm_vit(state, spec, ""))
        else:
            return None
    except ce.TowerImportError as e:
        # naming family detected but the layout/spec doesn't fit this model —
        # worth surfacing (the right spec is probably another --clip-models)
        return {"tower": f"clip:{model_name}", "family_detected": True,
                "error": str(e)}
    except Exception:  # noqa: BLE001 — shape mismatch etc: not this spec
        return None
    if params is None:
        return None
    import jax

    n = _n_params(params)
    rec = {"tower": f"clip:{model_name}", "n_params": n}
    if n <= max_fwd:
        params_j = jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, params)
        s = spec.image_size
        x = jnp.asarray(np.random.RandomState(0).rand(1, s, s, 3), jnp.float32)
        emb = (ce._rn_encode(params_j, spec, x)
               if isinstance(spec, ce.ResNetSpec)
               else ce._vit_encode(params_j, spec, x))
        rec["fingerprint"] = _fingerprint_array(emb)
    else:
        rec["fingerprint"] = _fingerprint_tree(params)
        rec["forward_skipped"] = f"> max_forward_params"
    return rec


def main():
    ap = argparse.ArgumentParser(
        description="report import status of every tower weights file in a "
                    "directory, in one pass")
    ap.add_argument("weights_dir")
    ap.add_argument("--clip-models", nargs="*",
                    default=["EVA02-E-14-plus", "ViT-B-16-SigLIP-256", "RN50",
                             "clip-ViT-B/16", "clipa-ViT-bigG-14",
                             "siglip-ViT-SO400M-14"],
                    help="CLIP specs to try (metrics/clip_encoder.py "
                         "MODEL_SPECS names)")
    ap.add_argument("--max-forward-params", type=float, default=3e8,
                    help="skip the forward fingerprint above this many "
                         "parameters (EVA02-E: 4.4B)")
    ap.add_argument("--out", default=None, help="write the report JSON here")
    args = ap.parse_args()

    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import torch

    files = sorted(p for ext in ("pth", "pt", "bin")
                   for p in glob.glob(os.path.join(args.weights_dir, "**",
                                                   f"*.{ext}"),
                                      recursive=True))
    if not files:
        print(f"no .pth/.pt/.bin files under {args.weights_dir}",
              file=sys.stderr)
        return 2

    report = []
    all_matched = True
    for path in files:
        rel = os.path.relpath(path, args.weights_dir)
        print(f"== {rel}", flush=True)
        try:
            state = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(state, dict) and "state_dict" in state:
                state = state["state_dict"]
        except Exception as e:  # noqa: BLE001 — undecodable file
            print(f"   UNREADABLE: {e}")
            report.append({"file": rel, "error": f"unreadable: {e}"})
            all_matched = False
            continue

        matches = []
        for rec in [
            _try_vgg19(path, state, args.max_forward_params),
            _try_lpips(path, state, "vgg", args.max_forward_params),
            _try_lpips(path, state, "alex", args.max_forward_params),
            *[_try_clip(path, state, m, args.max_forward_params)
              for m in args.clip_models],
        ]:
            if rec is not None:
                matches.append(rec)
                tag = rec.get("fingerprint", rec.get("error", ""))
                n = rec.get("n_params")
                print(f"   {rec['tower']:<28} "
                      f"{f'{n:,} params  ' if n else ''}{tag}")
        full = [m for m in matches if "error" not in m]
        if not full:
            all_matched = False
            print("   NO MATCH: none of the known naming families imported "
                  "this file" + (" (family detected but layout unsupported — "
                                 "see above)" if matches else ""))
        report.append({"file": rel, "matches": matches,
                       "imported": bool(full)})

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"weights_dir": args.weights_dir,
                       "files": report,
                       "all_imported": all_matched}, f, indent=2)
        print(f"report written to {args.out}")
    print("DRYRUN:", "ALL IMPORTED" if all_matched else "GAPS FOUND")
    return 0 if all_matched else 2


if __name__ == "__main__":
    sys.exit(main())
