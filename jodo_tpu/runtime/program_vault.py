"""Exported-program disk vault: skip JAX re-tracing across processes.

The persistent XLA compilation cache removes COMPILE cost on repeat
runs, but every process still pays trace+lower for each (pad, batch)
sampling program — measured ~20-25 s per 8-layer DGT chain program on
the 1-core bench host, the dominant cost of a warm start (BASELINE r5).
`jax.export` serializes the traced StableHLO module (~0.2 MB per chain
program, step-count independent); a later process deserializes in
milliseconds and its first call compiles through the XLA disk cache
(~4-15 s). Measured end-to-end: warm start 30-45 s/program -> 6-18 s.

Correctness model: a vault entry is keyed by a sha256 fingerprint of
  * every jodo_tpu/**/*.py source byte (ANY repo code change
    invalidates every entry — conservative by design),
  * jax version + backend platform + device kind,
  * the caller-provided signature (config json + shapes + dtypes).
Entries are therefore never stale w.r.t. model/config/code changes; the
cost of the conservatism is a full re-trace after any repo edit.

Used by sampling/generate.py warm/AOT paths (single-device programs;
mesh-sharded programs are not vaulted). JODO_PROGRAM_VAULT=0 disables.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Optional

__all__ = ["vault_enabled", "vault_key", "vault_load", "vault_store"]

_FINGERPRINT: Optional[str] = None


def _repo_fingerprint() -> str:
    """sha256 over all jodo_tpu python sources + jax/backend identity."""
    global _FINGERPRINT
    if _FINGERPRINT is not None:
        return _FINGERPRINT
    import jax

    h = hashlib.sha256()
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            h.update(os.path.relpath(path, pkg_root).encode())
            with open(path, "rb") as f:
                h.update(f.read())
    h.update(jax.__version__.encode())
    try:
        dev = jax.devices()[0]
        h.update(f"{dev.platform}:{dev.device_kind}".encode())
    except Exception:  # backend not initialised yet: key on platform flag
        h.update(str(jax.default_backend()).encode())
    _FINGERPRINT = h.hexdigest()[:20]
    return _FINGERPRINT


def _vault_dir() -> Optional[str]:
    if os.environ.get("JODO_PROGRAM_VAULT", "1") == "0":
        return None
    root = os.environ.get("JODO_PROGRAM_VAULT_DIR")
    if not root:
        repo_dir = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if not os.path.isdir(os.path.join(repo_dir, ".git")):
            repo_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                    "jodo_tpu")
        root = os.path.join(repo_dir, ".jodo_vault")
    try:
        os.makedirs(root, exist_ok=True)
    except OSError:
        return None
    return root


def vault_enabled() -> bool:
    return _vault_dir() is not None


def vault_key(kind: str, signature: str) -> str:
    """Filename-safe key: repo fingerprint x caller signature."""
    sig = hashlib.sha256(signature.encode()).hexdigest()[:20]
    return f"{kind}-{_repo_fingerprint()}-{sig}"


def vault_load(key: str):
    """Return the deserialized jax.export.Exported, or None."""
    root = _vault_dir()
    if root is None:
        return None
    path = os.path.join(root, key + ".jaxexp")
    if not os.path.exists(path):
        return None
    try:
        from jax import export as jexport

        with open(path, "rb") as f:
            return jexport.deserialize(bytearray(f.read()))
    except Exception:  # corrupt/incompatible entry: treat as miss
        logging.warning("program vault: failed to load %s; re-tracing", key)
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def vault_store(key: str, exported) -> None:
    root = _vault_dir()
    if root is None:
        return
    path = os.path.join(root, key + ".jaxexp")
    try:
        blob = exported.serialize()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: concurrent writers race safely
    except Exception:
        logging.warning("program vault: failed to store %s", key)
