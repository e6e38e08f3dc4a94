"""FID-parity gate wiring (VERDICT r2 missing #1).

The real gate needs network assets this environment cannot fetch (zero
egress, retries logged in scripts/fid_parity_gate.sh). The dry-wire mode
fabricates format-correct stand-ins (reference-naming .pt checkpoint via
port.export_maskdit, VAE .pth via port.export_vae, FID stats npz) and runs
the SAME three command stages, so the one-command gate is known-good
before the assets ever land.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_fid_parity_gate_dry_wire(tmp_path):
    env = dict(os.environ)
    env["FID_GATE_TMP"] = str(tmp_path)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "fid_parity_gate.sh"),
         "--dry-wire"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "DRY WIRING OK" in out
    assert "FID:" in out


def test_fid_parity_gate_script_is_valid_bash():
    """Cheap always-on check: the gate parses and knows its own stages."""
    path = os.path.join(REPO, "scripts", "fid_parity_gate.sh")
    subprocess.run(["bash", "-n", path], check=True)
    text = open(path).read()
    for needle in ("download_assets.py", "validate_port.py", "eval_latent.py",
                   "--dry-wire", "TARGET_FID"):
        assert needle in text, needle
