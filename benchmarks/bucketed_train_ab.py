"""Bucketed vs flat-pad TRAINING A/B (VERDICT r1 #2 / r2 task #3).

Two measurements on the real run_train_loop (fresh host batches, chunk
prefetch, multi-step dispatch — checkpointing disabled so the comparison
isolates the compute path):

  * throughput: wall it/s bucketed vs flat, per config
  * loss trajectory: final-window training loss bucketed vs flat at equal
    step count on the same synthetic dataset (bucketing must not change
    what is learned — losses are normalised by true n_nodes/edge counts,
    so padding is loss-invariant; this validates it end-to-end)

Usage: python benchmarks/bucketed_train_ab.py [qm9|geom] [n_iters]
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


def run_one(cfg_name, bucket_pads, n_iters, pad_n, batch, synthetic_size):
    from jodo_tpu.run_lib import run_train_loop

    cfg = get_config(cfg_name)
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = synthetic_size
    cfg.tpu.pad_nodes = pad_n
    cfg.training.batch_size = batch
    cfg.training.bucket_pads = bucket_pads
    cfg.training.n_iters = n_iters
    cfg.training.log_freq = max(32, n_iters // 8)
    cfg.training.snapshot_freq = 10 ** 9
    cfg.training.snapshot_freq_for_preemption = 10 ** 9
    cfg.training.snapshot_sampling = False
    cfg.model.dropout = 0.0
    cfg.tpu.donate_state = True
    workdir = tempfile.mkdtemp(prefix="jodo_bucket_ab_")
    t0 = time.perf_counter()
    try:
        _state, metrics = run_train_loop(cfg, workdir,
                                         sample_at_snapshot=False)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    wall = time.perf_counter() - t0
    return {
        "bucket_pads": bucket_pads or "flat",
        "n_iters": n_iters,
        "final_loss": metrics.get("loss"),
        "iters_per_sec_window": metrics.get("steps_per_sec"),
        "mols_per_sec_window": metrics.get("mols_per_sec"),
        "pad_steps": metrics.get("pad_steps"),
        "wall_s": round(wall, 1),
    }


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "qm9"
    if target == "qm9":
        cfg_name, pad_n, batch, ladder = (
            "qm9_uncond_jodo", 32, 128, "16,20,24,32")
        n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
        synthetic = 4096
    else:
        cfg_name, pad_n, batch, ladder = (
            "geom_uncond_jodo", 184, 16, "48,64,96,128")
        n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        synthetic = 2048
    rows = []
    for pads in ("", ladder):
        row = run_one(cfg_name, pads, n_iters, pad_n, batch, synthetic)
        rows.append(row)
        print(json.dumps(row), flush=True)
    flat, bucketed = rows
    if flat["iters_per_sec_window"] and bucketed["iters_per_sec_window"]:
        out = {
            "target": target,
            "speedup": round(bucketed["iters_per_sec_window"]
                             / flat["iters_per_sec_window"], 3),
            "loss_flat": flat["final_loss"],
            "loss_bucketed": bucketed["final_loss"],
        }
        # with bucket_batch_scale the honest throughput ratio is
        # molecules/sec (per-step batches differ across buckets)
        if flat.get("mols_per_sec_window") and bucketed.get(
                "mols_per_sec_window"):
            out["mols_speedup"] = round(
                bucketed["mols_per_sec_window"]
                / flat["mols_per_sec_window"], 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
