"""satlas_sr_tpu — a TPU-native JAX framework for satellite-imagery super-resolution.

A from-scratch rebuild of the capability surface of allenai/satlas-super-resolution
(reference layout documented in /root/repo/SURVEY.md) designed TPU-first:

- All image tensors are NHWC (feature dim on TPU lanes); parameters live in float32
  PyTrees with an optional bfloat16 compute dtype.
- The whole training step (generator fwd/bwd, discriminator fwd/bwd, EMA, spectral-norm
  power iteration) is a single jitted, functional program.
- Data parallelism is expressed with jax.sharding.Mesh + NamedSharding; gradient and
  loss reductions are compiler-inserted collectives over ICI (no NCCL-style runtime).
- Host-side data pipeline (PNG decode, frame selection) feeds device-sharded batches;
  normalization and USM sharpening run on device inside the jitted step.
"""

__version__ = "0.1.0"
