"""Dataset analysis CLI: node-count histograms (reference
datasets/analyze_dataset.py) — the numbers that populate
datasets_info.train_n_nodes and drive the generation-time size prior.

  python -m jodo_tpu.data.analyze --config qm9_uncond_jodo [--split train]
"""

from __future__ import annotations

import argparse
import collections


def node_num_hist(n_nodes) -> dict:
    return dict(sorted(collections.Counter(int(n) for n in n_nodes).items()))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="qm9_uncond_jodo")
    parser.add_argument("--split", default="train",
                        choices=["train", "valid", "test"])
    parser.add_argument("--synthetic", action="store_true",
                        help="use the synthetic fallback when data is absent")
    args = parser.parse_args(argv)

    from ..configs import get_config
    from . import get_dataset

    cfg = get_config(args.config)
    parts = get_dataset(cfg, synthetic_fallback=args.synthetic)
    ds = {"train": parts[0], "valid": parts[1], "test": parts[2]}[args.split]
    hist = node_num_hist(ds.n_nodes)
    print(f"{args.split} molecules: {len(ds)}")
    print(f"max_n_nodes: {max(hist)}")
    print("train_n_nodes histogram:")
    print(hist)


if __name__ == "__main__":
    main()
