"""The consolidated real-chip hazard regression tool must keep working
(tools/tpu_hazards.py — VERDICT r3 #3): its CPU self-check exercises the
full tool logic (production-contract checks + canary probes + banked
interpret-mode DMA) so the on-chip runs can't silently rot between
device claims."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_hazards_selfcheck(tmp_path):
    out = tmp_path / "hazards.json"
    res = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "tpu_hazards.py"),
            "--cpu-selfcheck",
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    led = json.loads(out.read_text())
    assert led["all_ok"] is True
    assert led["platform"] == "cpu"
    # every production-contract check ran and passed
    for key in (
        "H1_mxu_dot",
        "H2_fdiv",
        "H3_fma",
        "H23_tint_exhaustive",
        "H4_dma_banks",
    ):
        assert led[key]["ok"] is True, (key, led[key])
    # the XLA-codegen (every-backend) canaries must fire even on CPU —
    # they prove the probes still reach the behaviors the production
    # code designs out (docs/KERNELS.md)
    assert led["H2_fdiv"]["const_div_mismatches"] > 0
    assert led["H3_fma"]["bare_jit_fused_count"] > 0
    # the chip-only canaries must stay silent on CPU
    assert led["H1_mxu_dot"]["canary_fired"] is False
    assert led["H2_fdiv"]["runtime_div_mismatches"] == 0
    # the banked DMA run really split the library
    assert led["H4_dma_banks"]["n_banks"] >= 2
    assert led["H4_dma_banks"]["cross_dist"] == led["H4_dma_banks"]["cross_want"]
    # H5 (round-4 scan-aliasing class): the production static-slice
    # projection is exact on a multi-bank self-indexing library; the
    # scan-form reproducer stays silent on CPU (the miscompile is
    # TPU-stack-dependent — tools/tpu_r27_coarsefix.py R1 dates it)
    assert led["H5_scan_alias"]["ok"] is True
    assert led["H5_scan_alias"]["n_banks"] >= 2
    assert led["H5_scan_alias"]["canary_fired"] is False
