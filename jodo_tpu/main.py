"""CLI entry point.

Usage (mirrors the reference main.py:13-58):
  python -m jodo_tpu.main --config qm9_uncond_jodo --workdir runs/qm9 \
      --mode train [--config.model.nf 384 ...]

--config takes a named config from jodo_tpu.configs; any leaf can be
overridden with --config.<path> <value>.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _apply_overrides(config, overrides):
    for dotted, value in overrides:
        node = config
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        leaf = parts[-1]
        old = getattr(node, leaf)
        if isinstance(old, bool):
            value = value.lower() in ("1", "true", "yes")
        elif isinstance(old, int):
            value = int(value)
        elif isinstance(old, float):
            value = float(value)
        setattr(node, leaf, value)


def main(argv=None):
    parser = argparse.ArgumentParser(description="JODO-TPU")
    parser.add_argument("--config", required=True, help="named config")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--mode", choices=["train", "eval"], default="train")
    parser.add_argument("--eval_folder", default="eval")
    parser.add_argument(
        "--deterministic", action="store_true",
        help="bit-reproducible runs: global python/numpy seeding + "
        "XLA deterministic ops (reference main.py:24-31 / run_lib.py:21-33)",
    )
    args, unknown = parser.parse_known_args(argv)

    # --config.model.nf 384 style overrides
    overrides = []
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("--config."):
            if "=" in tok:
                k, v = tok[len("--config."):].split("=", 1)
                overrides.append((k, v))
                i += 1
            else:
                overrides.append((tok[len("--config."):], unknown[i + 1]))
                i += 2
        else:
            i += 1

    from .configs import CONFIGS, get_config

    if args.config not in CONFIGS:
        parser.error(
            f"unknown config '{args.config}'; available: {', '.join(sorted(CONFIGS))}"
        )
    config = get_config(args.config)
    _apply_overrides(config, overrides)

    # global seeding (reference set_random_seed, run_lib.py:21-33). JAX's
    # own PRNG is already seed-threaded via config.seed; this covers host
    # randomness (python shuffles, numpy loaders) and hashing.
    import random as pyrandom

    import numpy as np

    os.environ["PYTHONHASHSEED"] = str(config.seed)
    pyrandom.seed(config.seed)
    np.random.seed(config.seed)
    if args.deterministic:
        # deterministic XLA reductions/scatters (slower; opt-in like the
        # reference's --deterministic cudnn flag)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops"
        ).strip()
        import jax

        jax.config.update("jax_threefry_partitionable", True)

    os.makedirs(args.workdir, exist_ok=True)
    log_file = os.path.join(
        args.workdir, "stdout.txt" if args.mode == "train" else "eval_stdout.txt"
    )
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s - %(filename)s - %(asctime)s - %(message)s",
        handlers=[logging.StreamHandler(sys.stdout), logging.FileHandler(log_file)],
        force=True,
    )

    from . import run_lib

    if args.mode == "train":
        run_lib.train(config, args.workdir)
    else:
        run_lib.evaluate(config, args.workdir, args.eval_folder)


if __name__ == "__main__":
    main()
