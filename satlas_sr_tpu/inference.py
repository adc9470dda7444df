"""Batched TPU inference engine.

Replaces the reference's per-png batch=1 GPU loop (ssr/infer.py:45-67 — the
hot loop flagged in SURVEY.md §3.3) with a TPU-first design:

- ONE jitted program: uint8 NHWC batch in -> /255 -> generator -> clamp ->
  *255 uint8 out. Host<->device traffic is uint8 (4x smaller than float32) and
  quantisation runs on device.
- Fixed batch size with padding of the last partial batch: a single compiled
  executable regardless of corpus size (no recompiles, XLA-friendly static
  shapes).
- Optional bfloat16 compute and data-parallel sharding of the batch axis over
  a device mesh (jax.sharding) — infer_grid's 256 chunks per tile shard across
  all local devices (SURVEY.md §3.4, §5.7).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .parallel.mesh import data_mesh, mesh_2d, mesh_axis_size, shard_batch
from .utils.jax_cache import ssr_jit


class InferenceEngine:
    """Compiles and runs the uint8-to-uint8 SR program at a fixed batch size.

    `spatial_shards > 1` builds a 2-D ('data', 'space') mesh and shards the
    image-row axis too: XLA's SPMD pass partitions every conv with halo
    exchanges over ICI — bit-exact vs single-device, and the way to run ONE
    large tile (e.g. a whole 512x512 S2 grid) across all chips instead of
    chunk-and-stitch (see infer_grid whole-tile mode).
    """

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        batch_size: int = 64,
        use_3d: bool = False,
        n_frames: Optional[int] = None,
        matmul_precision: str = "highest",
        use_mesh: bool = True,
        spatial_shards: int = 1,
    ):
        self.model = model
        self.batch_size = batch_size
        self.use_3d = use_3d
        self.n_frames = n_frames
        if use_mesh:
            # Multi-process jobs (--launcher jax): each process runs an
            # INDEPENDENT program over its own corpus shard, so the engine's
            # mesh spans only this host's devices — results stay fully
            # addressable (np.asarray works) and no cross-host lockstep is
            # required between ranks with different batch counts (ADVICE r2).
            devices = jax.local_devices() if jax.process_count() > 1 else None
            self.mesh = (mesh_2d(spatial_shards, devices)
                         if spatial_shards > 1 else data_mesh(devices))
        else:
            self.mesh = None
        self._batch_quantum = 1
        if self.mesh is not None:
            # Pad batch to a multiple of the data-axis size for even sharding.
            n_dev = mesh_axis_size(self.mesh, "data", self.mesh.devices.size)
            self.batch_size = max(batch_size // n_dev, 1) * n_dev
            self._batch_quantum = n_dev
        if getattr(model, "dtype", None) in (jnp.bfloat16, jnp.float16):
            # Inference-only: store weights in the compute dtype — halves
            # per-step weight HBM reads; training keeps f32 master params.
            variables = jax.tree.map(
                lambda v: v.astype(model.dtype)
                if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
                else v,
                variables,
            )
        if self.mesh is not None:
            from .parallel.mesh import replicate_tree

            self.variables = replicate_tree(self.mesh, variables)
        else:
            self.variables = jax.device_put(variables)
        self._precision = matmul_precision

        @ssr_jit
        def _run(variables, x_uint8):
            with jax.default_matmul_precision(self._precision):
                x = x_uint8.astype(self.model.dtype) / jnp.asarray(255.0, self.model.dtype)
                y = self.model.apply(variables, x)
                if y.ndim == 5:  # [B, 1, H, W, C] from SRCNN/HighResNet
                    y = y[:, 0]
                y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0)
                # TRUNCATION is deliberate here: the reference's infer CLI
                # does (output * 255).astype(np.uint8) with no rounding
                # (ssr/infer.py:64), unlike its validation path (tensor2img
                # rounds — matched by models/base.py to_uint8). Keep the two
                # conversions distinct; they are both exact parity.
                return (y * 255.0).astype(jnp.uint8)

        self._run = _run

    def round_bucket(self, b: int) -> int:
        """Smallest valid compiled batch size >= b: mesh-even (the data axis
        shards the batch) and capped at the engine's full batch."""
        q = self._batch_quantum
        return min(self.batch_size, max(1, -(-int(b) // q) * q))

    def _prep(self, batch_np: np.ndarray, bucket: Optional[int] = None) -> np.ndarray:
        return prep_batch(batch_np, bucket or self.batch_size, self.use_3d,
                          self.n_frames)

    def _put(self, batch_np: np.ndarray, bucket: Optional[int] = None):
        x = self._prep(np.ascontiguousarray(batch_np), bucket)
        if self.mesh is not None:
            return shard_batch(self.mesh, x)
        return jax.device_put(x)

    def run(self, batch_np: np.ndarray) -> np.ndarray:
        """uint8 [B, 32, 32, T*3] (or 5-D) -> uint8 [B, H_out, W_out, 3]."""
        n = batch_np.shape[0]
        y = self._run(self.variables, self._put(batch_np))
        return np.asarray(y)[:n]

    def dispatch(self, batch_np: np.ndarray, bucket: Optional[int] = None):
        """Asynchronously enqueue a batch; returns an opaque in-flight handle.

        device_put and the jitted call return immediately (JAX async
        dispatch); pair with `fetch` from another thread to overlap transfer,
        compute and result readback — the serving daemon's pipeline
        (satlas_sr_tpu/serve.py) and run_many both ride this.

        `bucket` pads to that batch shape instead of the full batch_size —
        the jitted program compiles once per distinct shape, so a serving
        daemon can keep a small-batch executable next to the full one and
        stop charging shallow queues for 64 padded slots (serve.py buckets).
        """
        n = batch_np.shape[0]
        return n, self._run(self.variables, self._put(batch_np, bucket))

    def fetch(self, handle) -> np.ndarray:
        """Block for a `dispatch` handle's result; strips the batch padding."""
        n, y = handle
        return np.asarray(y)[:n]

    def run_many(self, batches: Iterable[np.ndarray], depth: int = 3) -> Iterable[np.ndarray]:
        """Pipelined execution: up to `depth` batches in flight.

        device_put and dispatch are async in JAX; a multi-deep flight window
        overlaps PCIe/tunnel transfer, device compute AND the result fetch of
        earlier batches with host formatting of later ones (the reference's
        CUDAPrefetcher role, train.py:77-86 — but on the output side too,
        which matters on a high-latency tunnel link).
        """
        return pipelined(self.dispatch, self.fetch, batches, depth)


def prep_batch(batch_np: np.ndarray, batch_size: int, use_3d: bool = False,
               n_frames: Optional[int] = None) -> np.ndarray:
    """Pad to the compiled batch size; optionally reshape to 5-D frames.

    Shared by InferenceEngine and the AOT ExportedEngine (export.py) so the
    live and deserialized programs see identical inputs."""
    n = batch_np.shape[0]
    if n < batch_size:
        pad = np.repeat(batch_np[:1], batch_size - n, axis=0)
        batch_np = np.concatenate([batch_np, pad], axis=0)
    if use_3d and batch_np.ndim == 4:
        b, h, w, tc = batch_np.shape
        t = n_frames or tc // 3
        batch_np = batch_np.reshape(b, h, w, t, tc // t).transpose(0, 3, 1, 2, 4)
    return batch_np


def pipelined(dispatch, fetch, batches: Iterable[np.ndarray], depth: int = 3):
    """Generic in-flight window: up to `depth` dispatched batches pending."""
    from collections import deque

    pending: deque = deque()  # dispatch handles
    for b in batches:
        pending.append(dispatch(b))
        if len(pending) >= max(1, depth):
            yield fetch(pending.popleft())
    while pending:
        yield fetch(pending.popleft())


def batched(items: Sequence, batch_size: int) -> List[Sequence]:
    return [items[i : i + batch_size] for i in range(0, len(items), batch_size)]


def prefetch_map(pool, fn, items: Iterable, depth: int = 3):
    """Map `fn` over `items` on `pool`, keeping up to `depth` tasks in flight.

    The host-pipeline idiom shared by the infer CLIs: results come back in
    order while later items decode/format concurrently with the consumer.
    """
    import itertools
    from collections import deque

    it = iter(items)
    in_flight = deque(pool.submit(fn, x) for x in itertools.islice(it, depth))
    while in_flight:
        fut = in_flight.popleft()
        for x in itertools.islice(it, 1):
            in_flight.append(pool.submit(fn, x))
        yield fut.result()


class BoundedWriter:
    """Async writes with backpressure: at most `max_pending` in flight.

    An unbounded writer queue holds every pending image in RAM when storage
    is slower than the device; blocking on the oldest write caps memory at
    max_pending images and surfaces write errors near where they happen.
    """

    def __init__(self, pool, max_pending: int = 32):
        from collections import deque

        self._pool = pool
        self._max = max(1, max_pending)
        self._pending: Any = deque()

    def submit(self, fn, *args) -> None:
        if len(self._pending) >= self._max:
            self._pending.popleft().result()
        self._pending.append(self._pool.submit(fn, *args))

    def drain(self) -> None:
        while self._pending:
            self._pending.popleft().result()
