"""Distributed execution: device meshes and the data-parallel train step.

The reference is strictly single-process/single-GPU; multi-GPU sync-BN was an
open TODO (README.md:210, SURVEY.md §2.3). This package delivers it the TPU
way: a `jax.sharding.Mesh` with a `data` axis, `shard_map`-wrapped train step
with `lax.pmean` gradient averaging and cross-replica batch-norm moments, XLA
collectives riding ICI.
"""
