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


def _enable_compilation_cache():
    """Persistent XLA compilation cache (repo-local, override with
    JODO_COMPILE_CACHE; JODO_COMPILE_CACHE=0 disables).

    The bucketed sampling ladder + per-pad kernel auto-selection compile
    one program per (pad, batch, kernel) combination; on the tunneled TPU
    first-compiles run 20-40 s each, so a cold `bench.py` spends most of
    its wall clock in the compiler. The cache makes every repeat
    invocation (CI, the driver's bench run, serving restarts) hit disk
    instead of recompiling.
    """
    import os

    path = os.environ.get("JODO_COMPILE_CACHE", "")
    if path == "0":
        return
    # a user-configured JAX cache dir always wins (ADVICE r2): never
    # silently override the standard env var with the repo-local default
    if not path and os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if not path:
        repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if not os.path.isdir(os.path.join(repo_dir, ".git")):
            # pip-installed: don't write into site-packages' parent — use
            # the per-user cache dir instead
            repo_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "jodo_tpu"
            )
        path = os.path.join(repo_dir, ".jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax or read-only fs
        pass


_enable_compilation_cache()
