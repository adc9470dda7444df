"""ESRGAN GAN trainer: generator + U-Net SN discriminator, one jitted step.

Capability parity with ssr/models/ssr_esrgan_model.py:
- USM-sharpened GT with per-loss selection flags l1_gt_usm / percep_gt_usm /
  gan_gt_usm (lines 119-129); sharpening runs on device inside the step
- x4-upsampled LR conditioning and/or old-NAIP conditioning concatenated onto
  the discriminator input (lines 131-133, 168-178, 199-213)
- G losses: L1 pixel + VGG perceptual (+ optional SSIM, CLIP) + vanilla GAN,
  gated by net_d_iters / net_d_init_iters (lines 144-193)
- D step: real + fake BCE on per-pixel logits (lines 215-228)
- EMA of the generator every iteration (lines 230-231)
- loss dict means are global across devices (reduce_loss_dict parity, line 233)

TPU-native structure: generator forward/backward, discriminator
forward/backward, spectral-norm power iterations, EMA and both optimizer
updates compose into ONE compiled XLA program over the sharded batch. The
G-update gating is a lax.cond whose skip branch still runs the plain G forward
(the reference computes self.output before the gate) so the D step always sees
the current generator output.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..archs import build_arch
from ..losses import build_loss
from ..losses.basic import gan_loss as build_gan
from ..ops.resize import upsample_nearest
from ..ops.usm import usm_sharp
from ..registry import MODEL_REGISTRY
from .base import (BaseModel, accum_grads, build_optimizer, ema_update,
                   to_uint8)
from ..utils.jax_cache import ssr_jit


@MODEL_REGISTRY.register("SSRESRGANModel")
class ESRGANModel(BaseModel):
    def __init__(self, opt: Dict[str, Any]):
        super().__init__(opt)
        train = bool(opt.get("is_train"))
        self.scale = int(opt.get("scale", 4))

        g_opt = dict(opt["network_g"])
        self.n_frames = None
        # Reference configs carry stale num_in_ch (SURVEY.md §5.6); derive the
        # real channel count from the train dataset's n_s2_images * bands.
        ds_train = (opt.get("datasets") or {}).get("train") or {}
        if ds_train:
            n_imgs = int(ds_train.get("n_s2_images", 8))
            bands = ds_train.get("s2_bands") or ["tci"]
            ch = 3 + (len(bands) - 1)
            derived = n_imgs * ch
            if int(g_opt.get("num_in_ch", derived)) != derived:
                self.logger.warning(
                    f"network_g.num_in_ch={g_opt.get('num_in_ch')} inconsistent with "
                    f"dataset (n_s2_images*channels={derived}); using {derived}."
                )
            g_opt["num_in_ch"] = derived
            self.n_frames = n_imgs
        self.num_in_ch = int(g_opt["num_in_ch"])
        from ..utils.model_utils import compute_dtype

        self._dtype = compute_dtype(opt)
        g_opt.setdefault("dtype", self._dtype)
        self.net_g = build_arch(g_opt)

        self.feed_disc_lr = bool(opt.get("feed_disc_lr", False))
        self.has_old_hr = bool(
            ((opt.get("datasets") or {}).get("train") or {}).get("old_naip_path")
        )
        self.l1_gt_usm = bool(opt.get("l1_gt_usm", True))
        self.percep_gt_usm = bool(opt.get("percep_gt_usm", True))
        self.gan_gt_usm = bool(opt.get("gan_gt_usm", False))

        self.accum_steps = 1  # overridden from train.accum_steps when training
        rng = jax.random.PRNGKey(int(opt.get("manual_seed", 0) or 0))
        example = jnp.zeros((1, 32, 32, self.num_in_ch), jnp.float32)
        params_g = self.net_g.init(rng, example)["params"]
        pre_g = self.load_pretrained("network_g", "pretrain_network_g")
        if pre_g is not None:
            params_g = pre_g["params"]

        self.state: Dict[str, Any] = {"step": jnp.zeros((), jnp.int32), "g": {"params": params_g}}

        if train:
            train_opt = opt["train"]
            d_opt = dict(opt["network_d"])
            disc_in = 3 + (self.num_in_ch if self.feed_disc_lr else 0) + (3 if self.has_old_hr else 0)
            if int(d_opt.get("num_in_ch", disc_in)) != disc_in:
                self.logger.warning(
                    f"network_d.num_in_ch={d_opt.get('num_in_ch')} inconsistent with "
                    f"conditioning flags; using {disc_in}."
                )
            d_opt["num_in_ch"] = disc_in
            d_opt.setdefault("dtype", self._dtype)
            self.net_d = build_arch(d_opt)
            d_example = jnp.zeros((1, 32 * self.scale, 32 * self.scale, disc_in), jnp.float32)
            d_vars = self.net_d.init(rng, d_example, *self._extra_d_init_args())
            params_d, spectral = d_vars["params"], d_vars.get("spectral", {})
            pre_d = self.load_pretrained("network_d", "pretrain_network_d")
            if pre_d is not None:
                params_d = pre_d["params"]
                spectral = pre_d.get("spectral", spectral)

            self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
            percep_opt = train_opt.get("perceptual_opt") or {}
            if percep_opt:
                # the VGG tower follows the model's compute dtype (bf16 halves
                # its fwd+bwd time; YAML `dtype` key overrides if set)
                percep_opt = dict(percep_opt)
                percep_opt.setdefault("dtype", self._dtype)
            self.cri_perceptual = build_loss(percep_opt) if percep_opt else None
            # Which perceptual components exist is static (weights in config);
            # needed so the cond skip-branch zero-logs match g_update's keys.
            self._has_percep = bool(percep_opt) and float(
                percep_opt.get("perceptual_weight", 1.0)
            ) > 0
            self._has_style = bool(percep_opt) and float(
                percep_opt.get("style_weight", 0) or 0
            ) > 0
            self.cri_gan = (
                build_loss(train_opt["gan_opt"]) if train_opt.get("gan_opt") else build_gan()
            )
            self.ssim_loss = build_loss(train_opt["ssim_opt"]) if train_opt.get("ssim_opt") else None
            self.clip_sim = build_loss(train_opt["clip_opt"]) if train_opt.get("clip_opt") else None
            self.net_d_iters = int(train_opt.get("net_d_iters", 1))
            self.net_d_init_iters = int(train_opt.get("net_d_init_iters", 0))
            # Beyond-reference: gradient accumulation over k micro-batches per
            # optimizer update (one lax.scan inside the same jitted step) —
            # e.g. accum_steps: 8 reproduces the reference recipe's 8-GPU
            # global batch (8 x 32) on ONE chip without the measured batch-64
            # HBM regression (BENCH_NOTES.md).
            self.accum_steps = int(train_opt.get("accum_steps", 1) or 1)

            optim_g = train_opt["optim_g"]
            optim_d = train_opt["optim_d"]
            self.tx_g = build_optimizer(optim_g, self.make_schedule(optim_g))
            self.tx_d = build_optimizer(optim_d, self.make_schedule(optim_d))

            self.state["g"]["opt"] = self.tx_g.init(params_g)
            self.state["d"] = {
                "params": params_d,
                "spectral": spectral,
                "opt": self.tx_d.init(params_d),
            }
            if self.ema_decay > 0:
                self.state["ema"] = jax.tree.map(jnp.array, params_g)
            self._train_step = self._build_train_step()
        else:
            if self.ema_decay >= 0 and pre_g is not None and "params_ema" in pre_g:
                self.state["ema"] = pre_g["params_ema"]

        self.torch_export = {
            "g": opt["network_g"]["type"],
            "d": (opt.get("network_d") or {}).get("type"),
        }
        self.replicate_state()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------ steps

    def _extra_d_init_args(self):
        """Extra example args for net_d.init (object crops for the OSM variant)."""
        return ()

    def _disc_input(self, img, lr_resized, old_hr):
        parts = [img]
        if self.feed_disc_lr:
            parts.append(lr_resized)
        if self.has_old_hr and old_hr is not None:
            parts.append(old_hr)
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else img

    def _prep_step_inputs(self, lr_u8, hr_u8, old_hr_u8):
        """uint8 batch -> normalised lr/old_hr, USM-selected GT variants."""
        lr = lr_u8.astype(jnp.float32) / 255.0
        gt = hr_u8.astype(jnp.float32) / 255.0
        old_hr = old_hr_u8.astype(jnp.float32) / 255.0 if old_hr_u8 is not None else None
        gt_usm = usm_sharp(gt)
        l1_gt = gt_usm if self.l1_gt_usm else gt
        percep_gt = gt_usm if self.percep_gt_usm else gt
        gan_gt = gt_usm if self.gan_gt_usm else gt
        lr_resized = upsample_nearest(lr, self.scale)
        return lr, old_hr, l1_gt, percep_gt, gan_gt, lr_resized

    def _g_content_losses(self, out, l1_gt, percep_gt):
        """Pixel + perceptual(+style) + SSIM terms shared by both GAN trainers."""
        total = jnp.zeros((), jnp.float32)
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(out, l1_gt)
            total += l_pix
            logs["l_g_pix"] = l_pix
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(out, percep_gt)
            if l_percep is not None:
                total += l_percep
                logs["l_g_percep"] = l_percep
            if l_style is not None:
                total += l_style
                logs["l_g_style"] = l_style
        if self.ssim_loss is not None:
            l_ssim = self.ssim_loss(out, percep_gt)
            total += l_ssim
            logs["l_g_ssim"] = l_ssim
        return total, logs

    def _g_clip_loss(self, out, l1_gt, total, logs):
        if self.clip_sim is not None:
            l_clip = self.clip_sim(out, l1_gt)
            total += l_clip
            logs["l_clip_sim"] = l_clip
        return total, logs

    @staticmethod
    def _apply_opt(tx, grads, opt_state, params):
        updates, new_opt = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda a, b: a + b, params, updates), new_opt

    def _g_loss_and_aux(self, p, lr, l1_gt, percep_gt, lr_resized, old_hr,
                        d_params, spectral):
        """Generator loss for one (micro-)batch under `jax.grad`.

        aux = (logs, generator output, post-forward spectral state) — shared
        by the plain and gradient-accumulation step builders so the GAN loss
        surface exists exactly once."""
        out = self.net_g.apply({"params": p}, lr)
        total, logs = self._g_content_losses(out, l1_gt, percep_gt)
        disc_in = self._disc_input(out, lr_resized, old_hr)
        fake_pred, mut = self.net_d.apply(
            {"params": d_params, "spectral": spectral},
            disc_in, update_stats=True, mutable=["spectral"],
        )
        l_gan = self.cri_gan(fake_pred, True, is_disc=False)
        total += l_gan
        logs["l_g_gan"] = l_gan
        total, logs = self._g_clip_loss(out, l1_gt, total, logs)
        return total, (logs, out, mut["spectral"])

    def _d_loss_and_aux(self, p, real_in, fake_in, spectral):
        """Discriminator real+fake loss for one (micro-)batch under `jax.grad`;
        the two forwards run sequential spectral-norm power iterations."""
        real_pred, mut1 = self.net_d.apply(
            {"params": p, "spectral": spectral}, real_in,
            update_stats=True, mutable=["spectral"],
        )
        l_d_real = self.cri_gan(real_pred, True, is_disc=True)
        fake_pred, mut2 = self.net_d.apply(
            {"params": p, "spectral": mut1["spectral"]}, fake_in,
            update_stats=True, mutable=["spectral"],
        )
        l_d_fake = self.cri_gan(fake_pred, False, is_disc=True)
        logs = {
            "l_d_real": l_d_real,
            "l_d_fake": l_d_fake,
            "out_d_real": jnp.mean(real_pred),
            "out_d_fake": jnp.mean(fake_pred),
        }
        return l_d_real + l_d_fake, (logs, mut2["spectral"])

    def _build_train_step(self):
        if self.accum_steps > 1:
            return self._build_accum_train_step()
        net_g = self.net_g
        tx_g, tx_d = self.tx_g, self.tx_d
        ema_decay = self.ema_decay
        net_d_iters, net_d_init_iters = self.net_d_iters, self.net_d_init_iters

        def step(state, lr_u8, hr_u8, old_hr_u8):
            current_iter = state["step"] + 1
            lr, old_hr, l1_gt, percep_gt, gan_gt, lr_resized = self._prep_step_inputs(
                lr_u8, hr_u8, old_hr_u8
            )

            g_params, g_opt = state["g"]["params"], state["g"]["opt"]
            d_params, spectral = state["d"]["params"], state["d"]["spectral"]

            do_g = jnp.logical_and(
                current_iter % net_d_iters == 0, current_iter > net_d_init_iters
            )

            def g_update(_):
                def loss_fn(p):
                    return self._g_loss_and_aux(
                        p, lr, l1_gt, percep_gt, lr_resized, old_hr,
                        d_params, spectral,
                    )

                grads, (logs, out, new_spectral) = jax.grad(loss_fn, has_aux=True)(g_params)
                new_params, new_opt = self._apply_opt(tx_g, grads, g_opt, g_params)
                return new_params, new_opt, out, new_spectral, logs

            def g_skip(_):
                out = net_g.apply({"params": g_params}, lr)
                zero_logs = {
                    k: jnp.zeros((), jnp.float32)
                    for k in self._g_log_keys()
                }
                return g_params, g_opt, out, spectral, zero_logs

            if net_d_iters == 1 and net_d_init_iters == 0:
                # Gate is always-true for the shipped configs: elide the cond
                # so XLA sees one straight-line program (smaller compile, and
                # fusion across the G/D boundary is not blocked by a branch).
                new_g_params, new_g_opt, output, spectral1, g_logs = g_update(None)
            else:
                new_g_params, new_g_opt, output, spectral1, g_logs = jax.lax.cond(
                    do_g, g_update, g_skip, operand=None
                )

            # --- discriminator step (real then fake, summed grads) ---
            real_in = self._disc_input(gan_gt, lr_resized, old_hr)
            fake_in = self._disc_input(jax.lax.stop_gradient(output), lr_resized, old_hr)

            def d_loss_fn(p):
                return self._d_loss_and_aux(p, real_in, fake_in, spectral1)

            d_grads, (d_logs, new_spectral) = jax.grad(d_loss_fn, has_aux=True)(d_params)
            new_d_params, new_d_opt = self._apply_opt(tx_d, d_grads, state["d"]["opt"], d_params)

            new_state = {
                "step": current_iter,
                "g": {"params": new_g_params, "opt": new_g_opt},
                "d": {"params": new_d_params, "spectral": new_spectral, "opt": new_d_opt},
            }
            if "ema" in state:
                new_state["ema"] = ema_update(state["ema"], new_g_params, ema_decay)
            logs = {**g_logs, **d_logs}
            return new_state, logs

        return ssr_jit(step, donate_argnums=(0,))

    def _build_accum_train_step(self):
        """Gradient-accumulation variant: inputs are [k, b, ...] micro-batch
        stacks (axis 1 mesh-sharded, see parallel/mesh.shard_microbatches);
        one lax.scan per network accumulates grads over the k micro-batches
        before a single optimizer update, so the effective batch is k*b at the
        activation footprint of b. Per-micro-batch normalisation/USM is
        recomputed inside each scan (cheap matmuls) instead of stashed —
        only the k generator outputs are carried between the G and D phases.
        Spectral-norm power iterations run sequentially through every D
        forward, exactly as k consecutive plain steps would."""
        net_g = self.net_g
        tx_g, tx_d = self.tx_g, self.tx_d
        ema_decay = self.ema_decay
        net_d_iters, net_d_init_iters = self.net_d_iters, self.net_d_init_iters
        k = self.accum_steps

        def step(state, lr_u8, hr_u8, old_hr_u8):
            current_iter = state["step"] + 1
            g_params, g_opt = state["g"]["params"], state["g"]["opt"]
            d_params, spectral = state["d"]["params"], state["d"]["spectral"]

            xs = {"lr": lr_u8, "hr": hr_u8}
            if old_hr_u8 is not None:
                xs["old"] = old_hr_u8

            def prep(xj):
                return self._prep_step_inputs(xj["lr"], xj["hr"], xj.get("old"))

            do_g = jnp.logical_and(
                current_iter % net_d_iters == 0, current_iter > net_d_init_iters
            )

            def g_update(_):
                def micro(params, xj, spec):
                    lr, old_hr, l1_gt, percep_gt, _, lr_resized = prep(xj)

                    def loss_fn(p):
                        return self._g_loss_and_aux(
                            p, lr, l1_gt, percep_gt, lr_resized, old_hr,
                            d_params, spec,
                        )

                    grads, (logs, out, new_spec) = jax.grad(loss_fn, has_aux=True)(params)
                    return grads, new_spec, (out, logs)

                grads, spec1, (outs, logs) = accum_grads(
                    micro, g_params, xs, k, carry=spectral)
                new_params, new_opt = self._apply_opt(tx_g, grads, g_opt, g_params)
                mean_logs = {kk: jnp.mean(v) for kk, v in logs.items()}
                return new_params, new_opt, outs, spec1, mean_logs

            def g_skip(_):
                def body(carry, xj):
                    out = net_g.apply(
                        {"params": g_params}, xj["lr"].astype(jnp.float32) / 255.0
                    )
                    return carry, out

                _, outs = jax.lax.scan(body, 0, xs)
                zero_logs = {kk: jnp.zeros((), jnp.float32) for kk in self._g_log_keys()}
                return g_params, g_opt, outs, spectral, zero_logs

            if net_d_iters == 1 and net_d_init_iters == 0:
                new_g_params, new_g_opt, outputs, spectral1, g_logs = g_update(None)
            else:
                new_g_params, new_g_opt, outputs, spectral1, g_logs = jax.lax.cond(
                    do_g, g_update, g_skip, operand=None
                )

            def d_micro(params, inp, spec):
                xj, fake_j = inp
                _, old_hr, _, _, gan_gt, lr_resized = prep(xj)
                real_in = self._disc_input(gan_gt, lr_resized, old_hr)
                fake_in = self._disc_input(
                    jax.lax.stop_gradient(fake_j), lr_resized, old_hr
                )

                def d_loss_fn(p):
                    return self._d_loss_and_aux(p, real_in, fake_in, spec)

                grads, (logs, new_spec) = jax.grad(d_loss_fn, has_aux=True)(params)
                return grads, new_spec, logs

            d_grads, new_spectral, d_logs = accum_grads(
                d_micro, d_params, (xs, outputs), k, carry=spectral1)
            new_d_params, new_d_opt = self._apply_opt(
                tx_d, d_grads, state["d"]["opt"], d_params
            )

            new_state = {
                "step": current_iter,
                "g": {"params": new_g_params, "opt": new_g_opt},
                "d": {"params": new_d_params, "spectral": new_spectral, "opt": new_d_opt},
            }
            if "ema" in state:
                new_state["ema"] = ema_update(state["ema"], new_g_params, ema_decay)
            d_mean = {kk: jnp.mean(v) for kk, v in d_logs.items()}
            return new_state, {**g_logs, **d_mean}

        return ssr_jit(step, donate_argnums=(0,))

    def _g_log_keys(self):
        """Exactly the keys g_update logs — both lax.cond branches must match."""
        keys = []
        if self.cri_pix is not None:
            keys.append("l_g_pix")
        if self._has_percep:
            keys.append("l_g_percep")
        if self._has_style:
            keys.append("l_g_style")
        if self.ssim_loss is not None:
            keys.append("l_g_ssim")
        keys.append("l_g_gan")
        if self.clip_sim is not None:
            keys.append("l_clip_sim")
        return keys

    def _build_eval_step(self):
        net_g = self.net_g
        precision = str(self.opt.get("matmul_precision", "highest"))

        @ssr_jit
        def step(params, lr_u8):
            with jax.default_matmul_precision(precision):
                lr = lr_u8.astype(jnp.float32) / 255.0
                out = net_g.apply({"params": params}, lr)
                return to_uint8(out)

        return step

    # ----------------------------------------------------------------- driver

    def train_iter(self, batch: Dict[str, Any], current_iter: int) -> Dict[str, float]:
        lr = self._shard_train_array(batch["lr"])
        hr = self._shard_train_array(batch["hr"])
        old_hr = (
            self._shard_train_array(batch["old_hr"])
            if self.has_old_hr and "old_hr" in batch else None
        )
        self.state, logs = self._train_step(self.state, lr, hr, old_hr)
        self.log_dict = logs  # device scalars; floated lazily at print_freq
        return logs

    def eval_params(self):
        return self.state.get("ema", self.state["g"]["params"])

    def eval_outputs(self, batch: Dict[str, Any]) -> np.ndarray:
        # Shard the eval batch over the mesh (same path as InferenceEngine):
        # devices split the batch when divisible, and in multi-process runs
        # each host feeds its local shard and reads only its rows back.
        from ..parallel.mesh import local_rows, shard_rows_padded

        lr, n = shard_rows_padded(self.mesh, np.asarray(batch["lr"]))
        out = self._eval_step(self.eval_params(), lr)
        return local_rows(out)[:n]

    def network_checkpoints(self) -> Dict[str, Dict[str, Any]]:
        nets = {
            "g": {
                "params": self.state["g"]["params"],
                "params_ema": self.state.get("ema", self.state["g"]["params"]),
            }
        }
        if "d" in self.state:
            nets["d"] = {
                "params": self.state["d"]["params"],
                "spectral": self.state["d"]["spectral"],
            }
        return nets
