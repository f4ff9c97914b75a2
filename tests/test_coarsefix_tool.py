"""The 2M coarse-projection fixproof tool must keep working
(tools/tpu_r27_coarsefix.py — the on-chip proof for the round-4
scan-output-aliasing root cause, ops/distance._ad_proj_bank_jit): its
CPU check exercises all three phases (old-scan reproducer + consistency
classifier, fixed-coarse bit-exactness vs host truth, full adaptive
re-run through the r18 harness) on a TWO-bank library so the device
runs can't silently rot between claims."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coarsefix_cpu_check():
    res = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "tpu_r27_coarsefix.py"),
            "--cpu-check",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    # the tool prints one summary JSON line last
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    # the scan aliasing is a TPU miscompile — it must NOT fire on CPU
    assert summary["repro_fires"] is False
    # the fixed coarse must be bit-exact vs the host ground truth
    assert summary["coarse_bitexact"] is True
    assert summary["spot_ok"] is True
    # the smoke library must really have split into two banks (the
    # structure that miscompiled); the ledger goes to the CPU-check
    # scratch path, never the real SCALE ledger
    led = json.loads(Path("/tmp/r27_cpu_check.json").read_text())
    assert led["P_r27_repro_old_scan"]["platform"] == "cpu"
    assert len(led["P_r27_repro_old_scan"]["q0_chunk_bad_total"]) == 16, (
        "expected 2 banks x 8 chunks"
    )
    assert led["P_r27_fixproof_coarse"]["coarse_bitexact_vs_host_truth"]
