"""Profiling & step-timing utilities (the reference has none; SURVEY
section 5 flags this as a required addition for the mols/sec north star)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["StepTimer", "trace", "dgt_forward_flops", "device_peak_flops", "mfu"]


class StepTimer:
    """Rolling-window steps/sec + mols/sec with warmup exclusion.

    steps and molecules are accumulated per tick so both rates cover the
    SAME window — deriving mols/sec from run-cumulative average batch
    size skews short bucketed runs whose early pad mixture differs from
    the window's (ADVICE r4)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []
        self._counts = []
        self._mols = []

    def tick(self, n_steps: int = 1, n_mols: int = 0):
        """Record a dispatch covering `n_steps` training steps consuming
        `n_mols` molecules (0 when the caller doesn't track batches)."""
        self._times.append(time.perf_counter())
        self._counts.append(n_steps)
        self._mols.append(n_mols)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._counts.pop(0)
            self._mols.pop(0)

    def _rate(self, values) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return sum(values[1:]) / dt if dt > 0 else None

    @property
    def steps_per_sec(self) -> Optional[float]:
        return self._rate(self._counts)

    @property
    def mols_per_sec(self) -> Optional[float]:
        rate = self._rate(self._mols)
        return rate if rate else None


def dgt_forward_flops(config, batch: int, pad_n: int) -> float:
    """Analytic matmul-FLOPs of one DGT forward (2·M·K·N per matmul, MFU
    convention: matmuls only, elementwise/softmax/GBF excluded).

    Enumerates every Dense / einsum in models/dgt.py + models/layers.py for
    the configured (nf, n_layers, heads, extra_heads, edge_ch, mlp_ratio)
    at static shapes [batch, pad_n]. Cross-checked against XLA's compiled
    cost_analysis in tests/test_profiling.py.
    """
    m = config.model
    d = int(m.nf)
    layers = int(m.n_layers)
    heads = int(m.n_heads)
    extra = int(m.n_extra_heads)
    equivariant = not bool(config.only_2D)
    node_nf = int(config.data.atom_types) + int(bool(m.include_fc_charge))
    edge_ch = int(m.edge_ch)
    mlp_ratio = int(m.mlp_ratio)
    e_h = d // 4
    t_dim = int(m.time_dim) if getattr(m, "time_dim", 0) else d * 4
    out_ch = d // heads
    sub_heads = heads - extra
    sub_ch = (heads * out_ch) // sub_heads
    dist_dim = e_h if bool(m.dist_gbf) else 1
    cat_node = (2 * d) // layers
    cat_edge = (2 * e_h) // layers

    b, n = batch, pad_n
    nodes = b * n
    pairs = b * n * n

    # --- per-graph (time embeddings, adaLN mods) ---
    per_graph = 2 * 17 * t_dim + 2 * t_dim * t_dim  # TimeMLP (sinusoidal 16+1)
    per_graph += layers * (
        2 * t_dim * 6 * d          # node_time_mlp
        + 2 * t_dim * 6 * e_h      # edge_time_mlp
        + (2 * t_dim * 2 * d if equivariant else 0)  # equi time_mlp
        + (2 * t_dim * 2 if equivariant else 0)      # GBF scale/shift
    )

    # --- per-node ---
    per_node = 2 * (2 * node_nf) * d  # node_emb (self-cond concat doubles in)
    per_node_layer = (
        2 * d * (sub_heads * sub_ch) * 2       # q, k
        + 2 * d * (heads * out_ch)             # v
        + 2 * d * e_h                          # node2edge_lin
        + 2 * 2 * d * (mlp_ratio * d)          # ff_node (two matmuls)
        + 2 * d * cat_node                     # skip head node_i
        + (2 * 2 * d * d if equivariant else 0)  # equi input_lin_i/_j
    )
    per_node += layers * per_node_layer
    atom_cat = d + layers * cat_node
    per_node += 2 * (atom_cat * d + d * (d // 2) + (d // 2) * node_nf)  # readout

    # --- per-pair ---
    e_in = 2 * edge_ch + (dist_dim if equivariant else 0)
    per_pair = 2 * e_in * e_h  # top-level edge_emb
    per_pair_layer = (
        2 * e_h * (sub_heads * sub_ch)         # attn gate w0
        + 2 * e_h * (heads * out_ch)           # attn gate w1
        + 3 * (sub_heads * sub_ch)             # logits einsum q·k·ea
        + 3 * (heads * out_ch)                 # PV einsum alpha·v·ev
        + 2 * 2 * e_h * (mlp_ratio * e_h)      # ff_edge
        + 2 * e_h * cat_edge                   # skip head edge_i
    )
    if equivariant:
        per_pair_layer += (
            2 * (2 * e_h) * e_h    # in-block edge_emb (dist ++ edge)
            + 2 * e_h * d          # equi w_e
            + 2 * dist_dim * d     # equi w_d
            + 2 * d * d            # equi coord_mlp_0
            + 2 * d * (1 + extra)  # equi coord_mlp_1
        )
    per_pair += layers * per_pair_layer
    edge_cat = e_h + layers * cat_edge
    per_pair += 2 * (edge_cat * e_h + e_h * (e_h // 2) + (e_h // 2) * 1)
    per_pair += 2 * (edge_cat * e_h + e_h * (e_h // 2) + (e_h // 2) * (edge_ch - 1))

    return float(b * per_graph + nodes * per_node + pairs * per_pair)


# Peak dense-matmul throughput per chip, FLOP/s. Sources: public TPU/GPU
# spec sheets (bf16 unless noted). Override with JODO_PEAK_TFLOPS.
_PEAK_TFLOPS_BY_KIND = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,  # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Best-effort peak bf16 FLOP/s of the attached accelerator; None when
    unknown (e.g. CPU), unless JODO_PEAK_TFLOPS is set."""
    import os

    env = os.environ.get("JODO_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    for name, tf in _PEAK_TFLOPS_BY_KIND.items():
        if kind.lower().startswith(name.lower()):
            return tf * 1e12
    return None


def mfu(flops_per_step: float, step_seconds: float, device=None) -> Optional[float]:
    """Model FLOPs utilisation in [0,1]; None if the peak is unknown."""
    peak = device_peak_flops(device)
    if not peak or step_seconds <= 0:
        return None
    return flops_per_step / step_seconds / peak


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
