"""One-command quality-parity harness against the reference checkpoints.

The SURVEY §7 step-2 hard gate — score a *reference-trained* checkpoint
through this framework and compare against the reference's own golden
sample pickles — is blocked in zero-egress environments (the checkpoints
live on Zenodo, record 8002902, reference README.md:108-129; the golden
pickles in /root/reference/rdkit_mols, README.md:72-80). This harness
packages the whole path so that the moment egress exists it is ONE
command:

  python -m jodo_tpu.compat.parity_harness --target qm9 --workdir /tmp/parity

which will: download the Zenodo zip -> extract the .pth -> convert it
(compat/torch_import.load_reference_checkpoint) -> run the full
`evaluate()` protocol with `eval.reference_ckpt` -> save the sample
pickle -> re-score it through `jodo_tpu.eval_pkl` (agreement check) ->
re-score the reference's golden pickle with the SAME metric stack and
print the two result dicts side by side.

`--dry-run` validates every step except the download: it synthesizes a
reference-FORMAT checkpoint (compat/fake_ref shapes, torch.save'd as the
reference's {model, ema, optimizer, step} dict, utils.py:23-30), runs the
convert -> evaluate -> pickle -> re-score chain end-to-end at tiny scale,
and asserts evaluate()/eval_pkl agreement. CI-tested in
tests/test_parity_harness.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile

import numpy as np

ZENODO = "https://zenodo.org/record/8002902/files"

# target -> (config name, zenodo zip, path of the eval ckpt inside the zip,
#            reference ckpt id, golden pickle in /root/reference/rdkit_mols,
#            eval_pkl --type)
TARGETS = {
    "qm9": (
        "qm9_uncond_jodo", "exp_uncond.zip",
        "exp_uncond/vpsde_qm9_jodo/checkpoints/checkpoint_30.pth",
        30, "qm9_jodo_ancestral_ckpt_30.pkl", "both",
    ),
    "geom": (
        "geom_uncond_jodo", "exp_uncond.zip",
        "exp_uncond/vpsde_geom_jodo_media/checkpoints/checkpoint_30.pth",
        30, "geom_jodo_ancestral_ckpt_35.pkl", "both",
    ),
    "zinc": (
        "zinc_2d_jodo", "exp_2d.zip",
        "exp_2d/vpsde_zinc_jodo/checkpoints/checkpoint_5.pth",
        5, "zinc_jodo_2d_ancestral_ckpt_5.pkl", "2D",
    ),
    "moses": (
        "moses_2d_jodo", "exp_2d.zip",
        "exp_2d/vpsde_moses_jodo/checkpoints/checkpoint_4.pth",
        4, "mose_jodo_ancestral_ckpt_4.pkl", "2D",
    ),
}

GOLDEN_DIR = "/root/reference/rdkit_mols"

# keys whose evaluate() vs eval_pkl re-score values must agree exactly
# (same molecules, same deterministic metric stack)
AGREEMENT_KEYS_3D = ["atom_stable", "mol_stable", "Validity", "Complete"]
AGREEMENT_KEYS_2D = ["atom_stable", "mol_stable", "Validity", "Unique"]


def make_fake_reference_ckpt(cfg, path: str, variant: str) -> None:
    """torch.save a reference-format training checkpoint (utils.py:23-30:
    {model, ema, optimizer, step}) with fake_ref shapes — the dry-run
    stand-in for a Zenodo download."""
    import torch

    from .fake_ref import make_fake_cdgs_state_dict, make_fake_state_dict

    rng = np.random.default_rng(0)
    if variant == "cdgs":
        sd = make_fake_cdgs_state_dict(cfg, rng)
    else:
        sd = make_fake_state_dict(cfg, rng, variant=variant)
    tsd = {k: torch.as_tensor(v) for k, v in sd.items()}
    state = {
        "model": tsd,
        # the reference's EMA serialises shadow_params as a list aligned
        # with [p for p in parameters() if requires_grad] (ema.py:79-86)
        "ema": {
            "decay": 0.999,
            "num_updates": 0,
            "shadow_params": list(tsd.values()),
        },
        "optimizer": {},
        "step": 0,
    }
    torch.save(state, path)


def _variant_for(cfg) -> str:
    name = str(cfg.model.name)
    return {"CDGS": "cdgs", "DGT2D": "2d", "DGTSim": "sim"}.get(name, "joint")


def download(url: str, dest: str) -> None:
    import urllib.request

    print(f"downloading {url} -> {dest}", flush=True)
    urllib.request.urlretrieve(url, dest)  # noqa: S310 — fixed Zenodo URL


def obtain_checkpoint(target: str, workdir: str, dry_run: bool,
                      ckpt_path: str | None, cfg) -> str:
    if ckpt_path:
        return ckpt_path
    name, zip_name, inner, _, _, _ = TARGETS[target]
    if dry_run:
        path = os.path.join(workdir, f"fake_{target}_reference.pth")
        make_fake_reference_ckpt(cfg, path, _variant_for(cfg))
        return path
    zpath = os.path.join(workdir, zip_name)
    if not os.path.exists(zpath):
        try:
            download(f"{ZENODO}/{zip_name}", zpath)
        except Exception as exc:
            raise SystemExit(
                f"Zenodo download failed ({exc}). This environment likely "
                "has no egress — run with --dry-run to validate the rest of "
                "the pipeline, or pass --ckpt with a local checkpoint."
            )
    out = os.path.join(workdir, inner)
    if not os.path.exists(out):
        with zipfile.ZipFile(zpath) as zf:
            zf.extract(inner, workdir)
    return out


def score_golden_pickle(target: str, dataset_root: str):
    """Re-score the reference's shipped 10k-molecule pickle with the same
    metric stack (requires rdkit to deserialise RDKit Mol objects)."""
    _, _, _, _, golden, typ = TARGETS[target]
    path = os.path.join(GOLDEN_DIR, golden)
    if not os.path.exists(path):
        print(f"golden pickle {path} not present (large-blob gap); skipping")
        return None
    try:
        import rdkit  # noqa: F401
    except ImportError:
        print("golden pickle present but rdkit is unavailable to "
              "deserialise RDKit Mol objects; skipping golden re-score")
        return None
    from .. import eval_pkl

    ds = "qm9" if target in ("qm9",) else (
        "Geom_Drugs" if target == "geom" else "qm9")
    return eval_pkl.main([
        "--pkl_path", path, "--dataset_name", ds, "--type", typ,
        "--root_path", dataset_root,
    ])


def run(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--target", default="qm9", choices=sorted(TARGETS))
    ap.add_argument("--workdir", default="parity_workdir")
    ap.add_argument("--ckpt", default=None,
                    help="local reference .pth (skips the download)")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthesize a fake reference-format checkpoint and "
                         "validate everything except the download")
    ap.add_argument("--num-samples", type=int, default=None,
                    help="override eval.num_samples (dry-run default: 64)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override sampling.steps (dry-run default: 20)")
    ap.add_argument("--batch-size", type=int, default=None)
    args = ap.parse_args(argv)

    from ..configs import get_config
    from ..run_lib import evaluate

    cfg_name, _, _, ref_id, _, typ = TARGETS[args.target]
    cfg = get_config(cfg_name)
    os.makedirs(args.workdir, exist_ok=True)

    if args.dry_run:
        # tiny-but-real shapes so the whole chain runs in seconds on CPU.
        # Force the CPU backend: under the forced-axon env a dry-run
        # would otherwise queue on the TPU grant (and collide with any
        # running TPU job — the tunnel is process-exclusive).
        import jax

        jax.config.update("jax_platforms", "cpu")
        cfg.model.nf = 32
        cfg.model.n_layers = 2
        cfg.model.n_heads = 4
        cfg.model.n_extra_heads = 2 if _variant_for(cfg) == "joint" else \
            cfg.model.n_extra_heads
        cfg.data.allow_synthetic = True
        cfg.data.synthetic_size = 256
        cfg.eval.num_samples = args.num_samples or 64
        cfg.eval.batch_size = 64
        cfg.sampling.steps = args.steps or 20
        cfg.eval.sub_geometry = False
    else:
        if args.num_samples:
            cfg.eval.num_samples = args.num_samples
        if args.steps:
            cfg.sampling.steps = args.steps
    if args.batch_size:
        cfg.eval.batch_size = args.batch_size

    ckpt_path = obtain_checkpoint(
        args.target, args.workdir, args.dry_run, args.ckpt, cfg)
    print(f"reference checkpoint: {ckpt_path}", flush=True)

    cfg.eval.reference_ckpt = ckpt_path
    cfg.eval.save_graph = True
    results = evaluate(cfg, args.workdir, eval_folder="parity_eval")
    ours = results["reference"]

    # re-score the saved pickle through the standalone CLI (the reference's
    # eval_rdkit_pkl.py cross-method oracle, README.md:82-106) and check
    # agreement with evaluate()'s in-process scores
    pkl = os.path.join(
        args.workdir, "parity_eval",
        f"{cfg.sampling.method}_ckpt_reference_{cfg.seed}.pkl")
    from .. import eval_pkl

    ds_name = "Geom_Drugs" if args.target == "geom" else "qm9"
    rescore = eval_pkl.main([
        "--pkl_path", pkl, "--dataset_name", ds_name,
        "--type", "2D" if cfg.only_2D else "both",
    ])
    mismatches = []
    if cfg.only_2D:
        pairs = [(f"2D_{k}", ("2D", k)) for k in AGREEMENT_KEYS_2D]
    else:
        pairs = [(f"3D_{k}", ("3D", k)) for k in AGREEMENT_KEYS_3D]
        pairs += [(f"2D_{k}", ("2D", k)) for k in AGREEMENT_KEYS_2D]
    for ours_key, (sec, k) in pairs:
        if ours_key not in ours or sec not in rescore:
            continue
        a, b = float(ours[ours_key]), float(rescore[sec][k])
        if abs(a - b) > 1e-6:
            mismatches.append((ours_key, a, b))
    if mismatches:
        raise SystemExit(f"evaluate() vs eval_pkl re-score disagree: "
                         f"{mismatches}")
    print("evaluate() vs eval_pkl re-score: AGREE on "
          f"{[p[0] for p in pairs if p[0] in ours]}")

    golden = score_golden_pickle(args.target, cfg.data.root.rstrip("/")
                                 .rsplit("/", 1)[0] + "/")
    report = {
        "target": args.target,
        "checkpoint": ckpt_path,
        "reference_ckpt_id": ref_id,
        "dry_run": args.dry_run,
        "ours": {k: (v if isinstance(v, str) else float(v))
                 for k, v in ours.items()},
        "golden": golden,
    }
    out_path = os.path.join(args.workdir, f"parity_{args.target}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(f"parity report written to {out_path}")
    if golden is not None:
        print("== side-by-side (ours vs reference golden pickle) ==")
        for sec, vals in golden.items():
            for k, v in vals.items():
                mine = ours.get(f"{sec}_{k}")
                if mine is not None:
                    print(f"  {sec}_{k}: ours={mine} golden={v}")
    return report


if __name__ == "__main__":
    sys.exit(0 if run() else 1)
