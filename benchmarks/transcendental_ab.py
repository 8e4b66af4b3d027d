"""A/B the transcendental knobs (JODO_SILU / JODO_ATTN_TANH /
JODO_EQUI_GATE) at the production bucket shapes — VERDICT r3 task #2.

The r3 floor analysis (BASELINE.md) attributes ~4-6 ms of the 10.4 ms
pad-20 sampling step to VPU transcendental issue (~780M tanh/silu/exp
per step); these knobs trade the transcendental unit for multiply-adds.
Each knob is read at TRACE time, so the sweep flips os.environ between
variants — every measurement jits a fresh closure, so no cache reuse.

Per-pad dispatch matches production (tpu.pallas_auto): plain XLA at
pad <= 16, fused Pallas attention above (BASELINE.md r4 per-pad A/B).

Usage: python benchmarks/transcendental_ab.py [iters] [pad_nxbatch,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from step_ab import time_scan_forward  # noqa: E402

from jodo_tpu.configs import get_config  # noqa: E402

KNOBS = ("JODO_SILU", "JODO_ATTN_TANH", "JODO_EQUI_GATE")

COMBOS = {
    "base": {},
    "silu=pade": {"JODO_SILU": "pade"},
    "tanh=exp": {"JODO_ATTN_TANH": "exp"},
    "tanh=pade": {"JODO_ATTN_TANH": "pade"},
    "equi=packed": {"JODO_EQUI_GATE": "packed"},
    "all-pade": {"JODO_SILU": "pade", "JODO_ATTN_TANH": "pade",
                 "JODO_EQUI_GATE": "packed"},
    "pade+exp": {"JODO_SILU": "pade", "JODO_ATTN_TANH": "exp",
                 "JODO_EQUI_GATE": "packed"},
}


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    shapes = [(16, 256), (20, 256), (24, 256), (32, 128)]
    if len(sys.argv) > 2:
        shapes = [tuple(int(x) for x in s.split("x"))
                  for s in sys.argv[2].split(",")]
    combos = COMBOS
    if os.environ.get("JODO_AB_COMBOS"):
        keep = os.environ["JODO_AB_COMBOS"].split(",")
        combos = {k: v for k, v in COMBOS.items() if k in keep}
    cfg_name = os.environ.get("JODO_AB_CONFIG", "qm9_uncond_jodo")
    probe = get_config(cfg_name)
    feat = 3 + int(probe.data.atom_types) + int(probe.model.include_fc_charge)
    edge_ch = int(probe.model.edge_ch)

    for pad_n, batch in shapes:
        for name, env in combos.items():
            for k in KNOBS:
                os.environ.pop(k, None)
            os.environ.update(env)
            cfg = get_config(cfg_name)
            cfg.model.dropout = 0.0
            cfg.tpu.compute_dtype = "bfloat16"
            # production per-pad dispatch (tpu.pallas_auto semantics)
            cfg.tpu.use_pallas = pad_n > 16
            cfg.tpu.use_pallas_block = False
            t0 = time.perf_counter()
            ms = time_scan_forward(cfg, batch, pad_n, feat, edge_ch, iters)
            wall = time.perf_counter() - t0
            print(
                f"pad={pad_n} batch={batch} {name:12s}: {ms:7.2f} ms/step "
                f"({ms / batch * 1e3:6.1f} us/mol)  [wall {wall:.0f}s]",
                flush=True,
            )
    for k in KNOBS:
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
