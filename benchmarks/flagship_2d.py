"""2D-only flagship-shape run (VERDICT r3 task #8) — the one exp_type
with no at-scale evidence before r4.

Reference protocol: run_lib.py:280-402 trains `vpsde` with only_2D on
ZINC250k/MOSES (DGT_concat_2D, models/mol_gnn.py:797-946) and evaluates
through the 2D metric stack. This driver runs it at real width (nf=256,
base config) on the 2D chemical synthetic set (valence-exact heavy-atom
graphs, implicit hydrogens — ZINC raw is egress-blocked) and prints a
quality-over-training table. 2D mol/atom stability is 0 by reference
semantics for non-QM9/GEOM datasets (evaluation/stability.py:122) — the
tracked metrics are Validity/Complete/Unique/FRGD/SNN/Frag.

Usage: python benchmarks/flagship_2d.py [--n-iters 20000]
       [--workdir runs/zinc_2d_flagship] [--eval-samples 256]
       [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg(args):
    from jodo_tpu.configs import get_config

    cfg = get_config("zinc_2d_jodo")
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = 4096
    cfg.training.n_iters = args.n_iters
    cfg.training.snapshot_freq = args.snapshot_freq
    cfg.training.snapshot_freq_for_preemption = args.snapshot_freq
    cfg.training.eval_samples = 0
    cfg.training.snapshot_sampling = False
    cfg.eval.num_samples = args.eval_samples
    cfg.eval.batch_size = args.eval_samples
    cfg.eval.save_graph = False
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iters", type=int, default=20000)
    ap.add_argument("--snapshot-freq", type=int, default=4000)
    ap.add_argument("--eval-samples", type=int, default=256)
    ap.add_argument("--workdir", default="runs/zinc_2d_flagship")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--eval-method", default="ancestral",
                    choices=["ancestral"],
                    help="2D sampling is ancestral-only (the DPM-Solver "
                         "hybrid is joint-3D-only, reference parity); "
                         "flag kept for CLI stability")
    ap.add_argument("--first-ckpt", type=int, default=1,
                    help="resume eval table from this checkpoint index")
    args = ap.parse_args()

    from jodo_tpu import run_lib

    cfg = _cfg(args)
    os.makedirs(args.workdir, exist_ok=True)

    if not args.skip_train:
        run_lib.train(cfg, args.workdir)

    n_ckpts = args.n_iters // args.snapshot_freq
    rows = []
    for ck in range(args.first_ckpt, n_ckpts + 1):
        cfg.eval.ckpts = str(ck)
        try:
            res = run_lib.evaluate(cfg, args.workdir, eval_folder="eval_2d")
        except FileNotFoundError as exc:
            print(json.dumps({"ckpt": ck, "error": str(exc)}), flush=True)
            continue
        r = res[ck]
        rows.append({
            "ckpt": ck,
            "step": ck * args.snapshot_freq,
            "2D_validity": r.get("2D_Validity"),
            "2D_complete": r.get("2D_Complete"),
            "2D_unique": r.get("2D_Unique"),
            "2D_novelty": r.get("2D_Novelty"),
            "FCD_analog": r.get("FCD"),
            "SNN": r.get("SNN"),
            "Frag": r.get("Frag"),
            "mols_per_sec": r.get("mols_per_sec"),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
