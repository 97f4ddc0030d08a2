"""DreamScene-TPU: a TPU-native 3D Gaussian splatting text-to-3D framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DreamScene (ECCV 2024, "3D Gaussian-based Text-to-3D Scene Generation via
Formation Pattern Sampling"): differentiable 3D Gaussian splat rendering,
formation-pattern-sampling diffusion guidance, compositional scene
optimization, and multi-chip scale-out over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  ops/        pure-jnp math + Pallas kernels (SH, quaternions, EWA
              projection, tile binning, alpha compositing fwd/bwd)
  models/     Gaussian parameter pytrees (fixed capacity + active mask),
              densification, PLY I/O, initializers, scene composition
  cameras/    camera model + pose samplers + stage camera loaders
  guidance/   Formation Pattern Sampling guidance (multi-timestep score
              distillation) over a pluggable Flax Stable-Diffusion
  training/   object / scene trainers (host-side orchestration)
  parallel/   mesh construction + sharded render/train step
  utils/      config system, logging, viz
"""

__version__ = "0.1.0"
