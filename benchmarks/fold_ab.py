"""A/B the algebraic LN fold in the equi update (models/dgt.py
_folded_gate) against the materialised path, at the production sampling
bucket shapes (value-fetch synchronised scan, per-step ms).

Usage: python benchmarks/fold_ab.py [iters]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from step_ab import time_scan_forward  # noqa: E402

from jodo_tpu.configs import get_config  # noqa: E402

SHAPES = [  # (pad, batch, use_pallas)  — per-pad auto-selection choices
    (16, 256, False),
    (20, 256, True),
    (24, 256, True),
    (32, 128, True),
]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    print(f"{'bucket':>14} | {'materialised':>12} | {'LN fold':>12}")
    for pad, batch, pallas in SHAPES:
        row = []
        for fold in (False, True):
            cfg = get_config("qm9_uncond_jodo")
            cfg.model.dropout = 0.0
            cfg.tpu.compute_dtype = "bfloat16"
            cfg.tpu.use_pallas = pallas
            cfg.tpu.pallas_auto = False
            cfg.tpu.fold_equi_ln = fold
            ms = time_scan_forward(cfg, batch, pad, feat=9, edge_ch=2,
                                   iters=iters)
            row.append(ms)
        print(f"pad {pad:3d} B={batch:4d} | {row[0]:9.2f} ms | {row[1]:9.2f} ms")


if __name__ == "__main__":
    main()
