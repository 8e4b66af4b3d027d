"""Standalone ablation bench for pallas_dgt kernel B (fused_edge_equi) at
QM9 sampling shapes — locate the in-kernel bottleneck (r2 verdict round:
the kernel measured ~1.0 ms/call vs ~0.43 ms for the XLA equivalent).

Usage: JODO_BLOCK_BK=N JODO_LN_MODE=vpu python benchmarks/kern_b.py [pad] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jodo_tpu.ops.pallas_dgt import fused_edge_equi

B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ED, HD, NG = 64, 256, 3
DT = jnp.bfloat16
K = 63  # GBF channels - 1
ITERS = 100


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 24)
    sq = jax.random.uniform(ks[0], (B, N, N), jnp.float32)
    e_in = jax.random.normal(ks[1], (B, N, N, ED), DT)
    extra = jax.random.normal(ks[2], (B, N, N, NG - 1), DT)
    em = jnp.ones((B, N, N), jnp.float32)
    y = jax.random.normal(ks[3], (B, N, ED), DT)
    z_i = jax.random.normal(ks[4], (B, N, HD), DT)
    z_j = jax.random.normal(ks[5], (B, N, HD), DT)
    gss = jnp.zeros((B, 2), jnp.float32)
    emod = jax.random.normal(ks[6], (B, 4 * ED), DT)
    eqss = jax.random.normal(ks[7], (B, 2 * HD), DT)
    cn = jnp.ones((1, 1), jnp.float32)
    b_n2e = jnp.zeros((1, ED))
    w_f0 = jax.random.normal(ks[8], (ED, 2 * ED), DT) * 0.1
    b_f0 = jnp.zeros((1, 2 * ED))
    w_f1 = jax.random.normal(ks[9], (2 * ED, ED), DT) * 0.1
    b_f1 = jnp.zeros((1, ED))
    means = jnp.linspace(0, 4, K)[None]
    stds = jnp.full((1, K), 0.5)
    w_ed = jax.random.normal(ks[10], (ED, HD), DT) * 0.1
    w_d0 = jnp.ones((1, HD))
    w_dg = jax.random.normal(ks[11], (K, HD), DT) * 0.1
    w_c0 = jax.random.normal(ks[12], (HD, HD), DT) * 0.1
    b_c0 = jnp.zeros((1, HD))
    w_c1 = jax.random.normal(ks[13], (HD, NG), DT) * 0.1

    def call(e):
        return fused_edge_equi(
            sq, e, extra, em, y, z_i, z_j, gss, emod, eqss, cn,
            b_n2e, w_f0, b_f0, w_f1, b_f1, means, stds, w_ed, w_d0, w_dg,
            w_c0, b_c0, w_c1,
            n_gate_heads=NG, dist_gbf=True, gbf_time_mod=False,
            cond_time=True, equivariant=True,
            interpret=jax.default_backend() != "tpu",
        )

    @jax.jit
    def run(e):
        def body(c, _):
            e_out, w = call(c)
            return e_out, jnp.sum(w)
        e_out, ws = jax.lax.scan(body, e, None, length=ITERS)
        return jnp.sum(e_out) + jnp.sum(ws)

    float(run(e_in))
    t0 = time.perf_counter()
    float(run(e_in))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"kernel B pad={N} batch={B} BK={os.environ.get('JODO_BLOCK_BK','auto')} "
          f"LN={os.environ.get('JODO_LN_MODE','mxu')} "
          f"VMEM={os.environ.get('JODO_BLOCK_VMEM_MB','6')}MB: {ms:.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
