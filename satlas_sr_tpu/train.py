"""Training pipeline CLI.

Parity with ssr/train.py's train_pipeline (SURVEY.md §3.1): parse options ->
resume-state discovery -> experiment dirs + loggers -> dataloaders -> model ->
prefetching iter loop with per-freq logging, checkpointing and validation.

`python -m satlas_sr_tpu.train -opt options/esrgan_s2naip_urban.yml
 [--launcher jax] [--auto_resume] [--debug] [--force_yml a:b=c]`

TPU-native loop structure: host threads prefetch uint8 batches; each iteration
is one jitted device program (model.train_iter) over the batch sharded across
the data mesh; log/checkpoint/validation cadence runs on host, rank-0 only.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

from .data import SequentialEvalLoader, build_dataset, build_train_loader
from .models import build_model
from .parallel.mesh import is_main_process
from .utils.logger import (
    AvgTimer, MessageLogger, get_root_logger, init_tb_logger, init_wandb_logger)
from .utils.options import copy_opt_file, dict2str, make_exp_dirs, parse_options


def find_resume_state(opt) -> Optional[str]:
    """Auto-locate the latest INTACT training_states/*.state (check_resume
    parity, plus integrity checking: a state torn by a mid-write kill is
    skipped with a warning and the previous snapshot is used instead)."""
    from .utils.checkpoint import verify_pytree_file

    explicit = (opt.get("path") or {}).get("resume_state")
    if explicit:
        return explicit
    if not opt.get("auto_resume"):
        return None
    if str((opt.get("train") or {}).get("checkpoint_backend") or "native") == "orbax":
        from .utils.orbax_io import latest_committed_step

        step = latest_committed_step(
            os.path.join(opt["path"]["training_states"], "orbax"))
        return None if step is None else f"orbax:{step}"
    state_dir = opt["path"]["training_states"]
    if not os.path.isdir(state_dir):
        return None
    states = [f for f in os.listdir(state_dir) if f.endswith(".state")]

    def key(f):
        stem = f[:-6]
        return int(stem) if stem.isdigit() else -1

    for fname in sorted(states, key=key, reverse=True):
        path = os.path.join(state_dir, fname)
        if verify_pytree_file(path):
            return path
        get_root_logger().warning(
            f"auto_resume: skipping corrupted/partial state {path}"
        )
    return None


def _broadcast_resume_decision(path: Optional[str]) -> Optional[str]:
    """Make every rank use rank 0's fresh-vs-resume decision.

    Ranks can see different filesystem states (a .state mid-write passing the
    integrity check on one host only, or non-shared experiment dirs): a rank
    that found no state enters make_exp_dirs' archive barrier while the
    others skip it — a deadlock — and even without the barrier, divergent
    start_iters desync the lockstep stop-poll/step collectives. If rank 0's
    choice names a file another rank cannot read, the resume fails LOUDLY
    there, which beats either silent desync or a hang.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(1024, np.uint8)
    if path:
        raw = path.encode()[:1024]
        buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    decoded = bytes(out).rstrip(b"\x00").decode()
    return decoded or None


def train_pipeline(root_path: str, argv=None) -> None:
    from .utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    opt, args = parse_options(root_path, is_train=True, argv=argv)
    opt["root_path"] = root_path

    resume_state_path = find_resume_state(opt)
    if int(opt.get("world_size", 1) or 1) > 1:
        resume_state_path = _broadcast_resume_decision(resume_state_path)
    if resume_state_path is None:
        # fresh run: archive a pre-existing experiment dir instead of
        # overwriting it (basicsr mkdir_and_rename parity, ssr/train.py:41-45)
        make_exp_dirs(opt, archive_existing=True)
    if is_main_process():
        make_exp_dirs(opt)
        copy_opt_file(args.opt, opt["path"]["experiments_root"])

    log_file = os.path.join(opt["path"]["log"], f"train_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file if is_main_process() else None)
    logger.info(dict2str(opt))
    # wandb BEFORE tb (sync_tensorboard hooks the writer) — reference order,
    # ssr/train.py:58-63; rank-0 only, skipped for debug runs like basicsr
    if is_main_process() and "debug" not in opt["name"]:
        init_wandb_logger(opt)
    tb_logger = init_tb_logger(opt) if is_main_process() else None

    # datasets / loaders
    train_ds_opt = opt["datasets"]["train"]
    train_set = build_dataset(train_ds_opt)
    # Gradient accumulation: each iteration consumes accum_steps micro-batches,
    # so the loader yields k*b rows (the model splits them into a [k, b] stack).
    accum = int((opt.get("train") or {}).get("accum_steps", 1) or 1)
    loader_ds_opt = train_ds_opt
    if accum > 1:
        loader_ds_opt = {
            **train_ds_opt,
            "batch_size_per_gpu":
                int(train_ds_opt.get("batch_size_per_gpu", 16)) * accum,
        }
    val_loaders = []
    for phase, ds_opt in opt["datasets"].items():
        if phase == "train":
            continue
        val_set = build_dataset(ds_opt)
        val_loaders.append(
            SequentialEvalLoader(val_set, batch_size=int(ds_opt.get("batch_size", 1)),
                                 rank=opt["rank"], world=opt["world_size"])
        )

    import jax

    total_iters = int(opt["train"]["total_iter"])
    # Global consumption per iteration: every process feeds
    # batch_size_per_gpu * local_device_count rows from its rank-sharded
    # sampler, so the epoch bookkeeping must count all world_size hosts.
    batch_per_step = (
        int(train_ds_opt.get("batch_size_per_gpu", 16)) * accum
        * jax.local_device_count() * int(opt["world_size"])
    )
    iters_per_epoch = max(len(train_set) // max(batch_per_step, 1), 1)

    model = build_model(opt)
    start_iter = 0
    epoch = 0
    if resume_state_path:
        info = model.resume_training(resume_state_path)
        start_iter, epoch = info["iter"], info["epoch"]
        logger.info(f"Resuming training from epoch: {epoch}, iter: {start_iter}.")

    # Built AFTER the resume decision: the loader fast-forwards its sampler
    # and draw-ordinal salts to start_iter's position, so a resumed run
    # consumes exactly the batches the uninterrupted run would have
    # (tests/test_training.py resume-equivalence; the reference restarts its
    # within-epoch data position on resume instead).
    rows_per_iter = (int(loader_ds_opt.get("batch_size_per_gpu", 16))
                     * jax.local_device_count())
    train_loader = build_train_loader(
        train_set, loader_ds_opt, seed=opt["seed_with_rank"],
        rank=opt["rank"], world_size=opt["world_size"],
        start_sample=start_iter * rows_per_iter,
    )

    msg_logger = MessageLogger(opt, start_iter, tb_logger)
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    logger.info(f"Start training from epoch: {epoch}, iter: {start_iter}")

    current_iter = start_iter
    val_freq = int((opt.get("val") or {}).get("val_freq", 0) or 0)
    ckpt_freq = int(opt["logger"].get("save_checkpoint_freq", 5000))
    print_freq = int(opt["logger"].get("print_freq", 100))

    # Profiling hook (SURVEY.md §5.1 — the reference has only wall-clock
    # AvgTimers; here a jax.profiler device trace can be captured mid-run).
    profile_opt = opt["logger"].get("profile") or {}
    profile_start = int(profile_opt.get("start_iter", 0) or 0)
    profile_iters = int(profile_opt.get("num_iters", 0) or 0)
    # First iteration this run executes is start_iter+1: clamp the trigger so
    # the default start_iter: 0 (or a resume past it) still fires instead of
    # silently never profiling.
    profile_trigger = max(profile_start, start_iter + 1)
    profile_dir = profile_opt.get(
        "dir", os.path.join(opt["path"]["log"], "profile")
    )
    profiling = False

    # Preemption-safe shutdown: managed TPU VMs deliver SIGTERM ahead of
    # eviction. The handler only sets a flag; the loop boundary saves a full
    # training state and returns cleanly so --auto_resume continues from it.
    # (The reference has no preemption story — a killed DDP rank loses
    # everything since the last save_checkpoint_freq snapshot.)
    stop_signals: list = []
    prev_sigterm = None
    try:
        prev_sigterm = signal.signal(
            signal.SIGTERM, lambda signum, frame: stop_signals.append(signum)
        )
    except ValueError:  # not the main thread (in-process harness)
        prev_sigterm = None

    world_size = int(opt.get("world_size", 1) or 1)
    # Collective stop polls are a blocking cross-host allgather; doing one at
    # EVERY iteration would serialize the async step-dispatch pipeline
    # (ADVICE r2). Preemption notice windows are tens of seconds, so the
    # poll gap must be bounded in WALL TIME (~10 s), not just iterations —
    # heavy accumulation steps at print_freq cadence could otherwise hold a
    # SIGTERM past the eviction deadline. All ranks derive the gap from
    # rank 0's step time (shipped inside the poll payload), keeping the
    # decision points identical across ranks so the collectives stay in
    # lockstep.
    stop_poll_cap = 1 if world_size <= 1 else max(
        1, min(int(opt["logger"].get("print_freq", 100)), 50))
    _poll = {"next": 0, "last_t": time.time(), "last_it": 0}

    def stop_requested(it: int) -> bool:
        """Collective stop decision. With >1 process the local flag is summed
        across processes (on a cadence identical on every rank) so ALL ranks
        leave the (collective) train step at the same iteration: a rank
        stopping alone would strand the others in the step's cross-process
        collectives, and the signal may land on a rank other than the one
        that saves (rank 0)."""
        if world_size <= 1:
            return bool(stop_signals)
        if it < _poll["next"]:
            return False  # local flag held until the next collective poll
        import numpy as _np
        from jax.experimental import multihost_utils

        now = time.time()
        secs_per_iter = (now - _poll["last_t"]) / max(it - _poll["last_it"], 1)
        payload = _np.asarray([float(bool(stop_signals)), secs_per_iter],
                              _np.float32)
        gathered = _np.asarray(multihost_utils.process_allgather(payload))
        _poll["last_t"], _poll["last_it"] = now, it
        r0_secs = max(float(gathered[0, 1]), 1e-3)  # rank 0's measurement
        _poll["next"] = it + int(_np.clip(10.0 / r0_secs, 1, stop_poll_cap))
        return bool(gathered[:, 0].sum())

    preempted = False
    train_iter_stream = iter(train_loader)
    try:
        while current_iter < total_iters:
            if stop_requested(current_iter):
                local = stop_signals[0] if stop_signals else "peer rank"
                logger.warning(
                    f"Stop signal ({local}) received: saving preemption "
                    f"state at iter {current_iter} and exiting cleanly."
                )
                model.save(epoch, current_iter)
                preempted = True
                break
            batch = next(train_iter_stream, None)
            if batch is None:  # finite sampler exhausted; restart an epoch
                train_iter_stream = iter(train_loader)
                continue
            data_timer.record()
            current_iter += 1
            epoch = current_iter // iters_per_epoch
            # (Frame/crop resampling across repeated chip visits is handled by
            # the loader's deterministic per-draw salt — see PrefetchLoader.)

            if profile_iters and current_iter == profile_trigger and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True

            model.train_iter(batch, current_iter)

            if profiling and current_iter >= profile_trigger + profile_iters:
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"Profiler trace written to {profile_dir}")
            iter_timer.record()
            if current_iter == start_iter + 1:
                msg_logger.reset_start_time()

            if current_iter % print_freq == 0 and is_main_process():
                log_vars = {"epoch": epoch, "iter": current_iter,
                            "lrs": model.get_current_learning_rate(),
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time()}
                log_vars.update(model.log_dict)
                msg_logger(log_vars)

            if current_iter % ckpt_freq == 0:
                logger.info("Saving models and training states.")
                model.save(epoch, current_iter)

            if val_freq and current_iter % val_freq == 0:
                for val_loader in val_loaders:
                    model.validation(
                        val_loader, current_iter, tb_logger,
                        bool((opt.get("val") or {}).get("save_img", False)),
                        dataset_name=val_loader.dataset.opt.get("name", "validation"),
                    )

            data_timer.start()
            iter_timer.start()
    finally:
        train_loader.stop()
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)

    if preempted:
        model.finish_checkpoints()
        return

    logger.info("End of training. Saving the latest model.")
    model.save(epoch=-1, current_iter=-1)
    model.finish_checkpoints()
    if val_freq:
        for val_loader in val_loaders:
            model.validation(
                val_loader, current_iter, tb_logger,
                bool((opt.get("val") or {}).get("save_img", False)),
                dataset_name=val_loader.dataset.opt.get("name", "validation"),
            )


def main(argv=None):
    root_path = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    train_pipeline(root_path, argv)


if __name__ == "__main__":
    main()
