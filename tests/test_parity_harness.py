"""Dry-run test for the one-command Zenodo parity harness.

Validates every step of compat/parity_harness except the (egress-blocked)
download: synthesize a reference-FORMAT .pth checkpoint, convert it, run
the full evaluate() protocol, save the pickle, re-score it through
eval_pkl, and assert agreement (reference README.md:72-129 protocol).
"""

import json
import os

import pytest

from jodo_tpu.compat import parity_harness


@pytest.mark.parametrize("target", ["qm9", "zinc"])
def test_parity_harness_dry_run(tmp_path, target):
    report = parity_harness.run([
        "--target", target, "--workdir", str(tmp_path),
        "--dry-run", "--num-samples", "32", "--steps", "8",
    ])
    assert report["dry_run"] is True
    assert report["target"] == target
    # the evaluate() results dict must carry the core metric keys
    keys = report["ours"].keys()
    if target == "zinc":
        assert "2D_Validity" in keys
    else:
        assert "3D_atom_stable" in keys and "2D_Validity" in keys
    # report written to disk
    out = tmp_path / f"parity_{target}.json"
    assert out.exists()
    loaded = json.loads(out.read_text())
    assert loaded["reference_ckpt_id"] == report["reference_ckpt_id"]
    # the sample pickle from evaluate() must exist (save_graph path)
    eval_dir = tmp_path / "parity_eval"
    assert any(p.endswith(".pkl") for p in os.listdir(eval_dir))


def test_parity_harness_refuses_download_without_egress(tmp_path):
    # without --dry-run and without --ckpt, the harness must fail with the
    # actionable egress message rather than hang (urllib has no egress here)
    import socket

    orig = socket.getaddrinfo

    def deny(*a, **k):
        raise OSError("no egress (test)")

    socket.getaddrinfo = deny
    try:
        with pytest.raises(SystemExit, match="dry-run"):
            parity_harness.run([
                "--target", "qm9", "--workdir", str(tmp_path),
                "--num-samples", "8", "--steps", "4",
            ])
    finally:
        socket.getaddrinfo = orig
