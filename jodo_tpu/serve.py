"""Molecule generation service: a lightweight HTTP server over the sampler.

Production-serving counterpart the reference lacks: load a trained
checkpoint once, keep the jit-compiled sampling round resident on the TPU,
and serve generation requests over HTTP.

  python -m jodo_tpu.serve --config qm9_uncond_jodo --workdir runs/qm9 \
      --ckpt 30 --port 8800 [--config.sampling.steps 50 ...]

API:
  GET  /health            -> {"status":"ok","model":...,"device":...}
  POST /warmup            body: {"n_samples": 32, "seed": 0}
       -> AOT-compiles the (pad, batch) programs that request shape
          needs (no chain execution); later /sample calls with the same
          shape pay zero compile latency
       -> {"programs": [[pad, batch]...], "compiled": k, "cached": m,
           "rounds": [[pad, batch]...], "elapsed_sec": ...}
  POST /sample            body: {"n_samples": 32, "seed": 0}
       -> {"molecules": [{"atoms": [...symbols...], "positions": [[x,y,z]..],
            "bonds": [[i,j,order]...], "formal_charges": [...]}, ...],
           "elapsed_sec": ...}
Requests are served sequentially (single device); the per-round batch is
fixed at compile time and requests are chunked across rounds.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class SamplingService:
    """Owns the compiled sampler + parameters; thread-safe sequential use."""

    def __init__(self, config, params, batch_size: int = 0):
        import jax

        from .configs.base import pad_nodes
        from .diffusion import NoiseSchedule
        from .models import create_model
        from .run_lib import build_training
        from .sampling import make_sampling_fn

        self.config = config
        self.batch_size = int(batch_size or config.eval.batch_size)
        parts = build_training(config)
        self._nodes_dist = parts["nodes_dist"]
        self._info = parts["info"]
        self._lock = threading.Lock()
        self._params = params
        # compiled per-pad round fns persist across requests: a request only
        # changes the number of rounds, never the compiled computation
        self._round_fns: dict = {}
        self._make_fn = lambda n: make_sampling_fn(
            config, parts["schedule"], parts["model"], parts["nodes_dist"],
            self.batch_size, n, parts["pad_n"], prop_dist=parts["prop_dist"],
            round_fn_cache=self._round_fns,
        )
        self.device = str(jax.devices()[0])

    def warmup(self, n_samples: int, seed: int = 0):
        """AOT-compile every (pad, batch) program the request shape needs
        (fn.warm, generate.py): a later /sample with the same shape pays
        zero compile latency. Executables persist in _round_fns across
        requests."""
        with self._lock:
            fn = self._make_fn(n_samples)
            report = fn.warm(self._params, seed=seed)
        return {
            "programs": [list(p) for p in report["programs"]],
            "compiled": len(report["compiled"]),
            "cached": len(report["cached"]),
            "rounds": [list(r) for r in report["rounds"]],
        }

    def sample(self, n_samples: int, seed: int = 0):
        with self._lock:
            fn = self._make_fn(n_samples)
            out = fn(self._params, seed=seed)
            mols = out[0] if isinstance(out, tuple) else out
        decoder = self._info["atom_decoder"]
        payload = []
        for m in mols:
            pos, atom_type, edge_type, fc = m
            bonds = []
            et = np.asarray(edge_type)
            src, dst = np.nonzero(np.triu(et, 1))
            for i, j in zip(src, dst):
                bonds.append([int(i), int(j), int(et[i, j])])
            payload.append({
                "atoms": [decoder[int(a)] for a in atom_type],
                "positions": None if pos is None else np.asarray(pos).round(4).tolist(),
                "bonds": bonds,
                "formal_charges": [int(c) for c in fc],
            })
        return payload


def make_handler(service: SamplingService, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {
                    "status": "ok",
                    "model": model_name,
                    "device": service.device,
                    "batch_size": service.batch_size,
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/sample", "/warmup"):
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("n_samples", 16))
                if n <= 0 or n > 100000:
                    raise ValueError("n_samples must be in [1, 100000]")
                seed = int(req.get("seed", 0))
            except (ValueError, json.JSONDecodeError) as exc:
                self._json(400, {"error": str(exc)})
                return
            t0 = time.perf_counter()
            if self.path == "/warmup":
                report = service.warmup(n, seed)
                report["elapsed_sec"] = round(time.perf_counter() - t0, 4)
                self._json(200, report)
                return
            mols = service.sample(n, seed)
            self._json(200, {
                "molecules": mols,
                "elapsed_sec": round(time.perf_counter() - t0, 4),
            })

        def log_message(self, fmt, *args):
            logging.info("serve: " + fmt, *args)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description="JODO-TPU sampling service")
    parser.add_argument("--config", required=True)
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--ckpt", type=int, default=-1,
                        help="numbered checkpoint; -1 => latest")
    parser.add_argument("--port", type=int, default=8800)
    parser.add_argument("--host", default="127.0.0.1")
    args, _ = parser.parse_known_args(argv)

    logging.basicConfig(level=logging.INFO)

    from .configs import get_config
    from .run_lib import build_training, init_state
    from .training import CheckpointManager

    config = get_config(args.config)
    parts = build_training(config)
    state = init_state(config, parts)
    mgr = CheckpointManager(args.workdir)
    ck = args.ckpt if args.ckpt >= 0 else max(mgr.available_checkpoints())
    state = mgr.restore_numbered(state, ck)
    params = {"params": state.ema_params["params"]}

    service = SamplingService(config, params)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service, args.config))
    logging.info("serving %s ckpt %d on %s:%d", args.config, ck, args.host,
                 args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
