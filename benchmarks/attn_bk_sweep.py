"""Sweep the fused-attention kernel's batch-block (BK) / VMEM budget at the
production sampling shapes; times the FULL model forward inside a scan
(the in-chain cost, same protocol as trace_step.py).

Usage: python benchmarks/attn_bk_sweep.py <pad> <batch> [iters]
Env per run is set in-process before the first trace (safe: one shape per
process invocation would be stricter, but the kernel jit key includes the
pallas_call object identity, so re-tracing per setting is forced by
clearing caches).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(pad, batch, bk, vmem, iters):
    env = dict(os.environ)
    env["JODO_ATTN_BK"] = str(bk)
    env["JODO_ATTN_VMEM_MB"] = str(vmem)
    code = f"""
import sys, time
sys.path.insert(0, {os.path.dirname(HERE)!r})
import jax, jax.numpy as jnp
from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model

pad_n, batch, iters = {pad}, {batch}, {iters}
feat, edge_ch = 9, 2
cfg = get_config("qm9_uncond_jodo")
cfg.model.dropout = 0.0
cfg.tpu.compute_dtype = "bfloat16"
cfg.tpu.use_pallas = True
cfg.tpu.use_pallas_block = False
model = create_model(cfg)
nm = jnp.ones((batch, pad_n))
em = jnp.ones((batch, pad_n, pad_n)) - jnp.eye(pad_n)[None]
xh0 = jnp.zeros((batch, pad_n, feat))
e0 = jnp.zeros((batch, pad_n, pad_n, edge_ch))
params = model.init(jax.random.PRNGKey(0), jnp.full((2,), 0.5), xh0[:2],
                    nm[:2], em[:2], e0[:2], jnp.full((2,), 0.5),
                    deterministic=True)

def body(carry, _):
    xh, e = carry
    pred, e_pred = model.apply(params, jnp.full((batch,), 0.5), xh, nm, em,
                               e, jnp.full((batch,), 0.5), deterministic=True)
    return (xh * (1.0 + 0.0 * jnp.mean(pred)),
            e * (1.0 + 0.0 * jnp.mean(e_pred))), ()

@jax.jit
def run(xh, e):
    (xh, e), _ = jax.lax.scan(body, (xh, e), None, length=iters)
    return jnp.sum(xh) + jnp.sum(e)

float(run(xh0, e0))
t0 = time.perf_counter(); v = float(run(xh0, e0))
dt = time.perf_counter() - t0
print(f"RESULT {{dt/iters*1e3:.3f}}")
"""
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=560)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    print(out.stdout[-2000:], out.stderr[-2000:])
    return None


def main():
    pad = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    for bk, vmem in [("auto", 6), (4, 12), (8, 24), (16, 48), (32, 96)]:
        ms = run_one(pad, batch, bk, vmem, iters)
        print(f"pad={pad} B={batch} BK={bk} vmem={vmem}MB: "
              f"{ms if ms is None else round(ms, 3)} ms/step", flush=True)


if __name__ == "__main__":
    main()
