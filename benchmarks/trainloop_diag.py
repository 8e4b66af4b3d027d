"""Decompose REAL-train-loop time: collate vs host->device transfer vs
jit dispatch vs AOT-executable dispatch (r4: the real loop measured ~10x
below the resident-batch rate on a 1-core host; find the component).

Run: python benchmarks/trainloop_diag.py [k] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu.configs import get_config
from jodo_tpu.run_lib import build_training, init_state
from jodo_tpu.parallel.mesh import make_mesh, replicate_state, shard_stacked_batch


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = 2048
    cfg.model.dropout = 0.1
    cfg.tpu.donate_state = True
    cfg.training.bucket_pads = ""
    parts = build_training(cfg, synthetic_fallback=True)
    state = init_state(cfg, parts)
    mesh = make_mesh(cfg.tpu.mesh_shape)
    state = replicate_state(state, mesh)
    loader = parts["loader"]
    it = loader.infinite_sync() if hasattr(loader, "infinite_sync") else loader.infinite()

    def make_chunk():
        raws = [next(it) for _ in range(k)]
        return {kk: np.stack([r[kk] for r in raws]) for kk in raws[0]}

    # 1. host collate
    t0 = time.perf_counter()
    chunks = [make_chunk() for _ in range(reps)]
    t_collate = (time.perf_counter() - t0) / reps
    print(f"collate {k}-chunk:      {t_collate*1e3:9.1f} ms", flush=True)

    # 2. host->device transfer (+ shard)
    nbytes = sum(v.nbytes for v in chunks[0].values())
    t0 = time.perf_counter()
    devs = []
    for c in chunks:
        d = shard_stacked_batch({kk: jnp.asarray(v) for kk, v in c.items()}, mesh)
        jax.block_until_ready(d)
        devs.append(d)
    t_xfer = (time.perf_counter() - t0) / reps
    print(f"transfer {nbytes/2**20:.1f}MB:     {t_xfer*1e3:9.1f} ms", flush=True)

    multi = parts["multi_train_step"]
    key = jax.random.key(0, impl="rbg")

    # 3. jit dispatch (resident chunks)
    state, m = multi(state, devs[0], key)
    float(m["loss"])
    t0 = time.perf_counter()
    for d in devs:
        state, m = multi(state, d, key)
        float(m["loss"])
    t_jit = (time.perf_counter() - t0) / reps
    print(f"jit dispatch:          {t_jit*1e3:9.1f} ms  ({k*1e3/ (t_jit*1e3):.1f} it/s)", flush=True)

    # 4. AOT executable dispatch (the run_train_loop default since r4)
    t0 = time.perf_counter()
    comp = multi.lower(state, devs[0], key).compile()
    print(f"aot lower+compile:     {(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
    st2, m = comp(state, devs[0], key)
    float(m["loss"])
    state = st2
    t0 = time.perf_counter()
    for d in devs:
        state, m = comp(state, d, key)
        float(m["loss"])
    t_aot = (time.perf_counter() - t0) / reps
    print(f"aot dispatch:          {t_aot*1e3:9.1f} ms  ({k*1e3/(t_aot*1e3):.1f} it/s)", flush=True)

    # 5. async pipeline emulation: dispatch all chunks, fetch once at end
    t0 = time.perf_counter()
    for d in devs:
        state, m = comp(state, d, key)
    float(m["loss"])
    t_pipe = (time.perf_counter() - t0) / reps
    print(f"aot pipelined:         {t_pipe*1e3:9.1f} ms  ({k*1e3/(t_pipe*1e3):.1f} it/s)", flush=True)


if __name__ == "__main__":
    main()
