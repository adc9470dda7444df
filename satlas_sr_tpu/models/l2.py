"""L2 model: SRCNN / HighResNet trainer with the WorldStrat loss.

Capability parity with ssr/models/ssr_l2_model.py: hardcoded loss
0.3*MSE + 0.4*MAE + 0.3*SSIM(window 5) over per-image means
(ssr_l2_model.py:36-40), logged psnr_loss = 10*log10(MSE) (line 43), output
squeezes the revisit dim, single Adam + MultiStepLR optimizer.

TPU-native: one jitted, donated train step over the sharded batch; uint8
batches are normalised on device; dropout RNG is part of the state PyTree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..archs import build_arch
from ..ops.ssim import ssim_loss as ssim_loss_map
from ..registry import MODEL_REGISTRY
from .base import BaseModel, build_optimizer, to_uint8
from ..utils.jax_cache import ssr_jit


@MODEL_REGISTRY.register("L2Model")
class L2Model(BaseModel):
    def __init__(self, opt: Dict[str, Any]):
        super().__init__(opt)
        # Gradient accumulation (round 4 — closes the trainer-surface
        # asymmetry vs esrgan/osm): one jitted step scans k micro-batches
        # into a single optimizer update, reproducing the reference's
        # 8-GPU global-batch SRCNN/HighResNet recipes on one chip
        # (reference README.md:159). train.py scales the loader batch by k.
        self.accum_steps = int(
            (opt.get("train") or {}).get("accum_steps", 1) or 1
        ) if opt.get("is_train") else 1
        net_opt = dict(opt["network_g"])
        # Thread the config's compute dtype into the arch exactly as the
        # ESRGAN trainer does (esrgan.py g_opt.setdefault("dtype", ...)) —
        # until round 5 this family silently ignored `compute_dtype`, so a
        # bfloat16 L2 config trained in float32. Params stay f32 (flax
        # param_dtype default); `dtype` is the computation dtype only.
        from ..utils.model_utils import compute_dtype

        net_opt.setdefault("dtype", compute_dtype(opt))
        # YAML blocks carry `revisits`; constructor parity handled by build_arch.
        self.net_g = build_arch(net_opt)
        self.use_3d = True  # SRCNN/HighResNet expect [B, T, H, W, C]

        t = int(net_opt.get("revisits", 8))
        c = int(net_opt.get("in_channels", 3))
        example = jnp.zeros((1, t, 32, 32, c), jnp.float32)
        rng = jax.random.PRNGKey(int(opt.get("manual_seed", 0) or 0))
        variables = self.net_g.init({"params": rng, "dropout": rng}, example)
        params = variables["params"]

        pretrained = self.load_pretrained()
        if pretrained is not None:
            params = pretrained["params"]

        if opt.get("is_train"):
            optim_opt = opt["train"]["optim_g"]
            self.tx = build_optimizer(optim_opt, self.make_schedule(optim_opt))
            opt_state = self.tx.init(params)
        else:
            self.tx, opt_state = None, ()

        self.state = {
            "step": jnp.zeros((), jnp.int32),
            "params": params,
            "opt": opt_state,
            "rng": rng,
        }
        # EMA support mirrors the basicsr SRModel base (srcnn/highresnet
        # released checkpoints carry params_ema); eval still uses the raw
        # params — the reference L2Model.test() does too (ssr_l2_model.py:56).
        if opt.get("is_train") and self.ema_decay > 0:
            self.state["ema"] = jax.tree.map(jnp.array, params)
        self.torch_export = {"g": opt["network_g"]["type"]}
        self.replicate_state()
        if opt.get("is_train"):
            self._train_step = (self._build_accum_train_step()
                                if self.accum_steps > 1
                                else self._build_train_step())
        else:
            self._train_step = None
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------ steps

    def _worldstrat_grads(self, params, lr_u8, hr_u8, dropout_rng):
        """Grads + logs of the WorldStrat loss on one (micro-)batch.

        0.3*MSE + 0.4*MAE + 0.3*SSIM(win 5) over per-image means
        (ssr_l2_model.py:36-40); psnr_loss = 10*log10(MSE) (line 43).
        Shared by the plain and accumulation step builders.
        """
        model = self.net_g
        lr = lr_u8.astype(jnp.float32) / 255.0
        hr = hr_u8.astype(jnp.float32) / 255.0

        def loss_fn(p):
            out = model.apply(
                {"params": p}, lr, train=True, rngs={"dropout": dropout_rng}
            )[:, 0]
            mse_i = jnp.mean(jnp.square(out - hr), axis=(1, 2, 3))
            mae_i = jnp.mean(jnp.abs(out - hr), axis=(1, 2, 3))
            ssim_i = jnp.mean(ssim_loss_map(out, hr, window_size=5), axis=(1, 2, 3))
            loss = jnp.mean(0.3 * mse_i + 0.4 * mae_i + 0.3 * ssim_i)
            logs = {
                "mse": jnp.mean(mse_i),
                "mae": jnp.mean(mae_i),
                "ssim": jnp.mean(ssim_i),
                "tot_loss": loss,
            }
            return loss, logs

        return jax.grad(loss_fn, has_aux=True)(params)

    def _finish_step(self, state, grads, logs, rng):
        """Optimizer update + EMA + log finalisation, shared by both steps."""
        updates, new_opt = self.tx.update(grads, state["opt"], state["params"])
        new_params = jax.tree.map(lambda p, u: p + u, state["params"], updates)
        new_state = {
            "step": state["step"] + 1,
            "params": new_params,
            "opt": new_opt,
            "rng": rng,
        }
        if "ema" in state:
            from .base import ema_update

            new_state["ema"] = ema_update(state["ema"], new_params, self.ema_decay)
        # psnr_loss derives from the (global-batch) mean MSE — NOT a mean of
        # per-micro-batch psnr values, which would differ under accumulation
        logs = dict(logs)
        logs["psnr_loss"] = 10.0 * jnp.log10(logs["mse"])
        return new_state, logs

    def _build_train_step(self):
        def step(state, lr_u8, hr_u8):
            rng, dropout_rng = jax.random.split(state["rng"])
            grads, logs = self._worldstrat_grads(
                state["params"], lr_u8, hr_u8, dropout_rng)
            return self._finish_step(state, grads, logs, rng)

        return ssr_jit(step, donate_argnums=(0,))

    def _build_accum_train_step(self):
        """Gradient-accumulation variant: [k, b, ...] micro-batch stacks,
        one lax.scan accumulating grads into a single optimizer update
        (shared skeleton: models/base.py accum_grads). Each micro-batch
        draws its own dropout key — exactly as k consecutive plain steps
        would; the grads are averaged, so the update equals a native k*b
        batch step whose dropout happened to tile that way."""
        k = self.accum_steps

        def step(state, lr_u8, hr_u8):
            from .base import accum_grads

            keys = jax.random.split(state["rng"], k + 1)
            xs = {"lr": lr_u8, "hr": hr_u8, "rng": keys[1:]}

            def micro(params, xj, _):
                grads, logs = self._worldstrat_grads(
                    params, xj["lr"], xj["hr"], xj["rng"])
                return grads, None, logs

            grads, _, logs = accum_grads(micro, state["params"], xs, k)
            mean_logs = {kk: jnp.mean(v) for kk, v in logs.items()}
            return self._finish_step(state, grads, mean_logs, keys[0])

        return ssr_jit(step, donate_argnums=(0,))

    def _build_eval_step(self):
        model = self.net_g
        precision = str(self.opt.get("matmul_precision", "highest"))

        @ssr_jit
        def step(params, lr_u8):
            with jax.default_matmul_precision(precision):
                lr = lr_u8.astype(jnp.float32) / 255.0
                out = model.apply({"params": params}, lr)[:, 0]
                return to_uint8(out)

        return step

    # ----------------------------------------------------------------- driver

    def _prep_lr(self, lr_np: np.ndarray) -> np.ndarray:
        if lr_np.ndim == 4:  # channel-stacked -> [B, T, H, W, C]
            b, h, w, tc = lr_np.shape
            t = tc // 3
            lr_np = lr_np.reshape(b, h, w, t, 3).transpose(0, 3, 1, 2, 4)
        return lr_np

    def train_iter(self, batch: Dict[str, Any], current_iter: int) -> Dict[str, float]:
        lr = self._shard_train_array(self._prep_lr(batch["lr"]))
        hr = self._shard_train_array(np.asarray(batch["hr"]))
        self.state, logs = self._train_step(self.state, lr, hr)
        # Keep logs as device scalars: fetching every iter would sync the
        # pipeline (~40% step-time overhead measured); MessageLogger floats
        # them only at print_freq.
        self.log_dict = logs
        return logs

    def eval_outputs(self, batch: Dict[str, Any]) -> np.ndarray:
        from ..parallel.mesh import local_rows, shard_rows_padded

        lr, n = shard_rows_padded(self.mesh, self._prep_lr(np.asarray(batch["lr"])))
        out = self._eval_step(self.state["params"], lr)
        return local_rows(out)[:n]

    def network_checkpoints(self) -> Dict[str, Dict[str, Any]]:
        ema = self.state.get("ema", self.state["params"])
        return {"g": {"params": self.state["params"], "params_ema": ema}}
