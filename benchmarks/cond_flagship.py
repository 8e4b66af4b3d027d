"""Flagship-scale conditional protocol (VERDICT r2 task #6).

Reference protocol: run_lib.py:503-632 trains `vpsde_edge_cond` and
sampling.py:283-391 scores generated molecules with a frozen EGNN
property classifier; the paper's table is property MAE over training.

This driver runs the whole thing at FLAGSHIP scale (nf=256/8L, batch 128)
on the property-carrying chemical synthetic set (QM9 raw is egress-
blocked):

  1. train qm9_cond_jodo for --n_iters with numbered snapshots
  2. evaluate() every checkpoint -> property MAE (classifier auto-trained
     once and cached under <workdir>/classifiers)
  3. print the MAE-over-training table with the two anchors:
       * classifier floor: held-in MAE of the frozen classifier
       * unconditional ceiling: E|p1 - p2| between two INDEPENDENT draws
         of p(prop | n) — the score of a perfect generator that ignores
         context entirely; a conditional model must land BELOW this

Usage: python benchmarks/cond_flagship.py [--n-iters 30000]
       [--workdir runs/qm9_cond_flagship] [--eval-samples 256]
       [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg(args):
    from jodo_tpu.configs import get_config

    cfg = get_config("qm9_cond_jodo")
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = 4096
    cfg.training.n_iters = args.n_iters
    cfg.training.snapshot_freq = args.snapshot_freq
    cfg.training.snapshot_freq_for_preemption = args.snapshot_freq
    cfg.training.eval_samples = 0
    cfg.training.snapshot_sampling = False
    cfg.eval.num_samples = args.eval_samples
    cfg.eval.batch_size = args.eval_samples
    cfg.eval.sub_geometry = False
    cfg.eval.save_graph = False
    return cfg


def unconditional_ceiling(prop_dist, nodes_dist, n=4096, seed=0):
    """MAE between two independent draws of p(prop|n), raw units."""
    del seed  # nodes_dist carries its own seeded rng
    sizes = nodes_dist.sample(n)
    a = prop_dist.sample_batch(sizes)
    b = prop_dist.sample_batch(sizes)
    norm = prop_dist.normalizer[prop_dist.properties[0]]
    mad = norm["mad"]
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))) * mad), mad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iters", type=int, default=30000)
    ap.add_argument("--snapshot-freq", type=int, default=5000)
    ap.add_argument("--eval-samples", type=int, default=256)
    ap.add_argument("--workdir", default="runs/qm9_cond_flagship")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    from jodo_tpu import run_lib

    cfg = _cfg(args)
    os.makedirs(args.workdir, exist_ok=True)

    if not args.skip_train:
        run_lib.train(cfg, args.workdir)

    # anchors
    parts = run_lib.build_training(cfg, synthetic_fallback=True)
    ceiling, mad = unconditional_ceiling(parts["prop_dist"],
                                         parts["nodes_dist"])
    print(json.dumps({"anchor": "unconditional_ceiling_raw", "value": ceiling,
                      "mad": mad}), flush=True)

    n_ckpts = args.n_iters // args.snapshot_freq
    rows = []
    for ck in range(1, n_ckpts + 1):
        cfg.eval.ckpts = str(ck)
        try:
            res = run_lib.evaluate(cfg, args.workdir, eval_folder="cond_eval")
        except FileNotFoundError as exc:
            print(json.dumps({"ckpt": ck, "error": str(exc)}), flush=True)
            continue
        r = res[ck]
        rows.append({
            "ckpt": ck,
            "step": ck * args.snapshot_freq,
            "property_mae_raw": r.get("property_mae_0"),
            "classifier": r.get("property_mae_classifiers"),
            "3D_atom_stable": r.get("3D_atom_stable"),
            "3D_validity": r.get("3D_Validity"),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({
        "table": rows,
        "unconditional_ceiling_raw": ceiling,
        "below_ceiling": [r["ckpt"] for r in rows
                          if r["property_mae_raw"] is not None
                          and r["property_mae_raw"] < ceiling],
    }))


if __name__ == "__main__":
    main()
