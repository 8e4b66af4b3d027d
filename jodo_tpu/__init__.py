"""JODO-TPU: a TPU-native framework for joint 2D & 3D molecular diffusion.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GRAPH-0/JODO
reference (arXiv:2305.12347) and CDGS (arXiv:2301.00427):

- dense, padded, statically-shaped batched tensors end-to-end (MXU-friendly),
- `lax.scan`-compiled samplers (ancestral + DPM-Solver hybrid),
- single-jit train step (noise sampling, Kabsch alignment, self-conditioning,
  EMA, adaptive gradient clipping all on-device),
- data parallelism over a `jax.sharding.Mesh` with XLA collectives,
- host-side chemistry (ingestion + metrics) with a pure-NumPy core and
  optional RDKit extras.

Layer map mirrors the reference (see SURVEY.md):
  CLI -> run_lib -> losses/train step -> diffusion schedule -> models
      -> samplers -> data pipeline -> evaluation -> cond-gen support.
"""

__version__ = "0.1.0"
