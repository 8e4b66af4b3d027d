"""Capture an XLA device trace of the sampling-shaped forward scan and
print the per-op time table (parsed from the xplane protobuf via the
tensorflow profiler protos).

Usage: python benchmarks/trace_step.py [pad_n] [batch] [variant] [iters]
variant in {xla, attn, block}.
"""

from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model

VARIANTS = {
    "xla": dict(use_pallas=False, use_pallas_block=False),
    "attn": dict(use_pallas=True, use_pallas_block=False),
    "block": dict(use_pallas=True, use_pallas_block=True),
}


def parse_xplane(logdir, topk=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane found under", logdir)
        return
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        op_time = defaultdict(float)
        op_count = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step lines etc. skipped
            if "xla op" in lname or "ops" == lname or "xla" in lname:
                pass
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                dur = ev.duration_ps / 1e9  # ms
                nm = meta.name
                op_time[(line.name, nm)] += dur
                op_count[(line.name, nm)] += 1
        by_line = defaultdict(float)
        for (ln, nm), t in op_time.items():
            by_line[ln] += t
        print(f"== plane: {plane.name}")
        for ln, t in sorted(by_line.items(), key=lambda kv: -kv[1]):
            print(f"   line {ln}: total {t:.2f} ms")
        # print per-op tables for every line ("XLA Ops" is the real
        # device-time attribution; "Async XLA Ops" double-counts spans)
        for ln in sorted(by_line, key=by_line.get, reverse=True):
            rows = [(nm, t, op_count[(ln2, nm)])
                    for (ln2, nm), t in op_time.items() if ln2 == ln]
            rows.sort(key=lambda r: -r[1])
            print(f"-- top ops on line '{ln}':")
            for nm, t, c in rows[:topk]:
                print(f"   {t:9.3f} ms  x{c:<6d} {nm[:110]}")


def main():
    pad_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    variant = sys.argv[3] if len(sys.argv) > 3 else "attn"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    feat, edge_ch = 9, 2

    cfg = get_config("qm9_uncond_jodo")
    cfg.model.dropout = 0.0
    cfg.tpu.compute_dtype = "bfloat16"
    for k, v in VARIANTS[variant].items():
        setattr(cfg.tpu, k, v)

    model = create_model(cfg)
    nm = jnp.ones((batch, pad_n))
    em = jnp.ones((batch, pad_n, pad_n)) - jnp.eye(pad_n)[None]
    xh0 = jnp.zeros((batch, pad_n, feat))
    e0 = jnp.zeros((batch, pad_n, pad_n, edge_ch))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.full((2,), 0.5), xh0[:2], nm[:2], em[:2], e0[:2],
        jnp.full((2,), 0.5), deterministic=True,
    )

    def body(carry, _):
        xh, e = carry
        noise = jnp.full((batch,), 0.5)
        t = jnp.full((batch,), 0.5)
        pred, e_pred = model.apply(
            params, t, xh, nm, em, e, noise, deterministic=True
        )
        xh = xh * (1.0 + 0.0 * jnp.mean(pred))
        e = e * (1.0 + 0.0 * jnp.mean(e_pred))
        return (xh, e), ()

    @jax.jit
    def run(xh, e):
        (xh, e), _ = jax.lax.scan(body, (xh, e), None, length=iters)
        return jnp.sum(xh) + jnp.sum(e)

    float(run(xh0, e0))  # compile + warm

    logdir = f"/tmp/trace_{variant}_{pad_n}_{batch}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    v = float(run(xh0, e0))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"variant={variant} pad={pad_n} batch={batch}: "
          f"{dt/iters*1e3:.2f} ms/step ({v:.1f})")
    parse_xplane(logdir)


if __name__ == "__main__":
    main()
