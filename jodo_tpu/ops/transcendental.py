"""Shared low-cost approximations for the gate transcendentals.

The DGT step evaluates ~780M tanh/silu/exp per sampling step at QM9
flagship shapes (BASELINE.md r3 floor analysis: attention gates 2x256
ch/pair + equi silu + edge-FFN silu + GBF exp, x8 layers) and runs at
~80% of the VPU transcendental bound — these knobs trade the
transcendental unit for VPU multiply-adds. They approximate the
reference's exact gates (`/root/reference/models/layers.py:72-82`).

KNOB SEMANTICS (ADVICE r3 #3): `JODO_ATTN_TANH` and `JODO_SILU` are read
at TRACE time. Flipping one after a jitted step function has compiled
silently has no effect — set them in the environment before the first
compile (same contract as every other env knob in this repo).

This module is the single home of the Pade rational (ADVICE r3 #2: it
was previously duplicated between layers._silu and pallas_attn._tanh).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

__all__ = ["pade_tanh", "attn_tanh", "pade_sigmoid"]


def pade_tanh(x):
    """Clamped depth-3 continued fraction (Pade(5/4)) for tanh:

        tanh(x) ~= x(945 + 105x^2 + x^4) / (945 + 420x^2 + 15x^4),

    evaluated on x clipped to [-4, 4] and clipped to [-1, 1]. Pure VPU
    multiply-add (+ one divide): no transcendental-unit issue at all.

    Error bounds (measured over R, f64 oracle):
      * tanh:            max |err| 1.36e-3 — under one bf16 rounding
                         (eps 2^-8 = 3.9e-3).
      * sigmoid via (1 + pade_tanh(x/2))/2:  max |err| <= 7e-4.
      * silu = x*sigmoid: max ABSOLUTE err ~5e-3 near |x|~7.3 (the x
        factor amplifies the sigmoid tail error); max RELATIVE err
        <= ~7e-4, under one bf16 rounding of the result.

    Preserves the input dtype (python-scalar weak typing).
    """
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc
    x4 = x2 * x2
    t = xc * (945.0 + 105.0 * x2 + x4) / (945.0 + 420.0 * x2 + 15.0 * x4)
    return jnp.clip(t, -1.0, 1.0)


def pade_sigmoid(x):
    """sigmoid(x) = (1 + tanh(x/2))/2 through the Pade rational
    (max |err| <= 7e-4; see pade_tanh)."""
    return 0.5 + 0.5 * pade_tanh(0.5 * x)


def attn_tanh(x):
    """Knob-aware tanh for the attention gate tensors (JODO_ATTN_TANH).

    Used by ALL attention dispatch paths — the Pallas fused forward, the
    jnp fallback forward, and the custom-VJP backward recompute — so the
    forward value is path-independent under any knob setting (ADVICE r3
    #1; previously the knob was Pallas-forward-only). The custom VJP's
    gate derivative stays the exact-tanh form (1 - ea^2), which is exact
    for mode 'exp' and first-order consistent (~1e-3) for 'pade'/'bf16'.

    Modes: 'exp' — the algebraically exact identity
    tanh(x) = 1 - 2/(1 + e^{2x}) (one exp + one reciprocal, saturates
    correctly at +/-inf in f32); 'bf16' — evaluate tanh at bf16 precision
    (the gates multiply bf16 value streams anyway); 'pade' — pade_tanh.
    Unset/other: exact jnp.tanh. Preserves the input dtype.
    """
    mode = os.environ.get("JODO_ATTN_TANH")
    if mode == "exp":
        return 1.0 - 2.0 / (1.0 + jnp.exp(2.0 * x))
    if mode == "bf16":
        return jnp.tanh(x.astype(jnp.bfloat16)).astype(x.dtype)
    if mode == "pade":
        return pade_tanh(x)
    return jnp.tanh(x)
