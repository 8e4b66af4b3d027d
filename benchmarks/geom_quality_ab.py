"""GEOM bucket_batch_scale time-to-QUALITY A/B (VERDICT r4 task #4,
ADVICE r4 medium).

The r4 claim "14.7x mols/sec" changed the effective batch 8x on the
dominant GEOM strata with no LR adjustment and only an equal-step loss
note behind it. This driver runs the REAL training loop (fresh host
batches, prefetch, multi-step dispatch, warmup pre-compiles excluded
from the budget) for an EQUAL WALL-CLOCK budget per variant:

  scale1        bucket_batch_scale=1.0 (reference-protocol batch 16/step)
  scale8        bucket_batch_scale=8.0, base LR (the r4 default)
  scale8_sqrt   bucket_batch_scale=8.0, LR x sqrt(8) (gradient-noise-
                scale heuristic for an 8x batch)

then samples n_mols molecules from each variant's EMA params through the
production bucketed sampler (AOT-warmed: zero compiles inside the
sampling window) and scores 3D/2D stability + validity — quality per
wall-clock minute, the axis the r4 throughput claim skipped.

Equal-fairness notes: optim.warmup is shrunk to 500 steps for ALL
variants (the production 100k-step ramp would leave every variant at
~1% LR inside a short A/B window and mask any dynamics difference);
dropout stays at the config default; the wall budget starts AFTER
compile warmup (training.max_train_wall_s semantics), so variants with
more programs to build are not charged for compiles.

Usage: python benchmarks/geom_quality_ab.py [wall_s=480] [n_mols=192]
Match: /root/reference/configs/vpsde_geom_uncond_jodo.py:72,78 (batch 16
training protocol), /root/reference/README.md:162-168.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jodo_tpu.configs import get_config  # noqa: E402


def _base_cfg(wall_s):
    cfg = get_config("geom_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = 4096
    cfg.training.batch_size = 16
    cfg.training.bucket_pads = "48,64,96"
    cfg.training.n_iters = 10 ** 7  # wall budget is the stop condition
    cfg.training.max_train_wall_s = float(wall_s)
    cfg.training.log_freq = 128
    cfg.training.snapshot_freq = 10 ** 9
    cfg.training.snapshot_freq_for_preemption = 10 ** 9
    cfg.training.snapshot_sampling = False
    cfg.optim.warmup = 500
    cfg.tpu.donate_state = True
    return cfg


def run_variant(name, wall_s, n_mols, scale, lr_mult):
    import jax

    from jodo_tpu.evaluation import get_edm_metric, get_2d_edm_metric
    from jodo_tpu.models import get_node_dist
    from jodo_tpu.run_lib import build_training, run_train_loop
    from jodo_tpu.sampling import make_sampling_fn

    cfg = _base_cfg(wall_s)
    cfg.training.bucket_batch_scale = float(scale)
    cfg.optim.lr = cfg.optim.lr * lr_mult

    workdir = tempfile.mkdtemp(prefix=f"jodo_geomq_{name}_")
    t0 = time.perf_counter()
    try:
        state, metrics = run_train_loop(cfg, workdir,
                                        sample_at_snapshot=False)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    train_wall = time.perf_counter() - t0

    # sample through the production bucketed path from the EMA params
    parts = build_training(cfg, synthetic_fallback=True)
    cfg.sampling.steps = int(os.environ.get("JODO_GEOMQ_STEPS", "100"))
    fn = make_sampling_fn(
        cfg, parts["schedule"], parts["model"], parts["nodes_dist"],
        batch_size=16, n_samples=n_mols, pad_n=parts["pad_n"],
    )
    params = {"params": state.ema_params["params"]}
    fn.warm(params, seed=17)
    t1 = time.perf_counter()
    mols = fn(params, seed=17)
    sample_wall = time.perf_counter() - t1
    assert fn.stats["compiles_last_call"] == 0

    info = parts["info"]
    stab, rd, _ = get_edm_metric(info)(mols)
    stab2, rd2, _ = get_2d_edm_metric(info)(mols)
    return {
        "variant": name,
        "scale": scale,
        "lr": cfg.optim.lr,
        "steps_done": metrics.get("final_step"),
        "final_loss": metrics.get("loss"),
        "iters_per_sec_window": metrics.get("steps_per_sec"),
        "mols_per_sec_window": metrics.get("mols_per_sec"),
        "pad_steps": metrics.get("pad_steps"),
        "train_wall_s": round(train_wall, 1),
        "sample_wall_s": round(sample_wall, 1),
        "atom_stable_3d": stab["atom_stable"],
        "mol_stable_3d": stab["mol_stable"],
        "validity_3d": rd["Validity"],
        "atom_stable_2d": stab2["atom_stable"],
        "mol_stable_2d": stab2["mol_stable"],
        "validity_2d": rd2["Validity"],
        "n_mols": len(mols),
    }


def main():
    wall_s = float(sys.argv[1]) if len(sys.argv) > 1 else 480.0
    n_mols = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    variants = [
        ("scale1", 1.0, 1.0),
        ("scale8", 8.0, 1.0),
        ("scale8_sqrt", 8.0, 8.0 ** 0.5),
    ]
    only = os.environ.get("JODO_GEOMQ_VARIANT")
    rows = []
    for name, scale, lr_mult in variants:
        if only and name != only:
            continue
        row = run_variant(name, wall_s, n_mols, scale, lr_mult)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if len(rows) > 1:
        print(json.dumps({
            "equal_wall_s": wall_s,
            "quality_rank_mol_stable_3d": sorted(
                ((r["variant"], r["mol_stable_3d"]) for r in rows),
                key=lambda t: -t[1]),
        }))


if __name__ == "__main__":
    main()
