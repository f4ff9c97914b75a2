"""The audit-oracle validation tool must keep working
(tools/tpu_r30_oraclecheck.py — the silicon check for the round-5
refactor of ops/distance._stripes_banked onto _bank_rows_flat_jit
row-space slicing + the shared _fold_topk_host merge): its CPU check
runs both phases (oracle full top-k vs host brute; production adaptive
with the audit forced on) at forced 8-bank geometry so the device runs
can't silently rot between claims."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_oraclecheck_cpu_check():
    res = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "tpu_r30_oraclecheck.py"),
            "--cpu-check",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    # the refactored oracle must stay bit-exact vs host brute
    assert summary["A_oracle_bitexact"] is True
    # the audit must actually RUN (not skip) when forced on — the spy
    # uses distance._audit_would_run, the same predicate production
    # coverage accounting relies on
    assert summary["B_audit_ran"] is True
    assert summary["B_spot_ok"] is True
