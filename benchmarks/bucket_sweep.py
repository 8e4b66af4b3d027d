"""Re-derive the sampling production table: per-bucket (pad, batch, kernel)
cost in us/mol/step, value-fetch synchronised (BASELINE.md r3 note).

The per-pad auto-selection (sampling/generate.py:_model_for_pad) and the
per-bucket batch table (_batch_for_pad) are built from this sweep.

Usage: python benchmarks/bucket_sweep.py [iters]
Env: JODO_SWEEP_PADS=16,20,24,32  JODO_SWEEP_BATCHES=128,256,512
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from step_ab import time_scan_forward  # noqa: E402

from jodo_tpu.configs import get_config  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    pads = [int(x) for x in os.environ.get(
        "JODO_SWEEP_PADS", "16,20,24,32").split(",")]
    batches = [int(x) for x in os.environ.get(
        "JODO_SWEEP_BATCHES", "128,256,512").split(",")]
    print(f"{'pad':>4} {'batch':>6} | {'xla ms':>8} {'us/mol':>7} | "
          f"{'attn ms':>8} {'us/mol':>7}")
    for pad in pads:
        for batch in batches:
            row = []
            for pallas in (False, True):
                cfg = get_config("qm9_uncond_jodo")
                cfg.model.dropout = 0.0
                cfg.tpu.compute_dtype = "bfloat16"
                cfg.tpu.use_pallas = pallas
                cfg.tpu.pallas_auto = False
                ms = time_scan_forward(cfg, batch, pad, feat=9, edge_ch=2,
                                       iters=iters)
                row.append(ms)
            print(f"{pad:>4} {batch:>6} | {row[0]:8.2f} "
                  f"{row[0] / batch * 1e3:7.1f} | {row[1]:8.2f} "
                  f"{row[1] / batch * 1e3:7.1f}", flush=True)


if __name__ == "__main__":
    main()
