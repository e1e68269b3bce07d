"""End-to-end rehearsal of the real-weight validation runbook (round-3
VERDICT weak #6 / next-step #4): scripts/validate_real_weights.py must run
the EXACT documented command sequence to completion against synthetic
full-geometry artifacts (scripts/make_synthetic_assets.py) — a full-size
random-weight torch merged TSPO-0.4B, a real CLIP BPE tokenizer dir, a tiny
LLaVA-Video checkpoint, and a small video set — so that on the day real
assets exist the runbook is known-good, not first-run.

Slow (~12 min warm / up to ~45 min on a cold XLA CPU compile cache: two
fresh full-geometry CLIP-L/14 phase-1 encodes):
``TSPO_RUN_SLOW=1 python -m pytest tests/test_validate_runbook.py``.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("TSPO_RUN_SLOW"),
    reason="runbook rehearsal is slow; set TSPO_RUN_SLOW=1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, timeout):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=timeout)
    assert p.returncode == 0, p.stdout[-4000:]
    return p.stdout


def test_runbook_end_to_end(tmp_path):
    a = str(tmp_path / "assets")
    _run(["scripts/make_synthetic_assets.py", "--out", a, "--with-backbone",
          "--candidate-frames", "24"], timeout=900)

    base = ["scripts/validate_real_weights.py",
            "--tspo-checkpoint", f"{a}/ckpt",
            "--backbone-dir", f"{a}/backbone",
            "--lvb-tsv", f"{a}/LVB.tsv",
            "--anno-json", f"{a}/lvb_val.json",
            "--video-root", f"{a}/videos",
            "--sample-num", "8", "--limit", "4"]

    # measured ~5 min/run with a warm ~/.cache/tspo_tpu_xla; the first-ever
    # full-geometry CPU compile can add tens of minutes, hence the headroom
    out1 = _run(base + ["--out-dir", f"{a}/run1"], timeout=2700)
    assert "all executed stages passed" in out1, out1[-2000:]
    assert "ok: scorer loaded" in out1 and "ok: backbone loaded" in out1
    assert "LongVideoBench accuracy" in out1        # stage 4 really ran
    assert os.path.exists(f"{a}/run1/LVB_frameIdx.json")

    # second fresh run (new cache/work dirs) must reproduce the first run's
    # indices exactly — the reference's own fidelity criterion (identical
    # features -> identical indices)
    out2 = _run(base + ["--out-dir", f"{a}/run2",
                        "--golden-frameidx", f"{a}/run1/LVB_frameIdx.json"],
                timeout=2700)
    assert "all executed stages passed" in out2, out2[-2000:]
    assert "frame_idx parity: 4/4 exact (100.0%)" in out2, out2[-2000:]


def test_runbook_smoke_tiny_clip(tmp_path):
    """Fast-geometry variant: same code path minutes faster — catches arg
    and plumbing regressions without the full-size encode cost."""
    a = str(tmp_path / "assets")
    _run(["scripts/make_synthetic_assets.py", "--out", a, "--tiny-clip",
          "--candidate-frames", "16"], timeout=300)
    out = _run(["scripts/validate_real_weights.py",
                "--tspo-checkpoint", f"{a}/ckpt",
                "--lvb-tsv", f"{a}/LVB.tsv",
                "--anno-json", f"{a}/lvb_val.json",
                "--video-root", f"{a}/videos",
                "--sample-num", "8", "--limit", "4",
                "--out-dir", f"{a}/run"], timeout=600)
    assert "all executed stages passed" in out, out[-2000:]
