"""Ledger lint: the proof ledgers the docs and bench embed must parse
and keep their load-bearing invariants. The on-chip tools rewrite these
files between claims (json.dump to a .tmp + os.replace), so a botched
write or a regression in a tool's ledger plumbing should fail CI, not
surface as a wrong claim in BENCH_r{N}.json or a doc."""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load(name):
    return json.loads((REPO / name).read_text())


def test_scale_ledger_invariants():
    s = _load("SCALE_r03.json")
    # the round-5 headline: the 2M point is exact, audited, certified
    ad2m = s["L2_ad2M"]
    assert ad2m["brute_top1_spot_ok"] is True
    assert ad2m["audit_ok"] is True
    assert ad2m["certified"] == ad2m["B"] == 4096
    # the pre-fix false certification stays on the record, as history
    hist = s["L2_ad2M_prefix_history"]
    assert hist and hist[0]["brute_top1_spot_ok"] is False
    # beyond-HBM streaming carries the production audit end-to-end;
    # a skipped bank must never be counted among the runs
    for key in ("N_stream6p8G_audit", "N_stream8p5G_audit"):
        e = s[key]
        assert e["audit_ok"] is True and e["brute_full_topk_rows_ok"] is True
        assert e["audit_runs"] == len(e["audit_bank_rows"])
        assert e["audit_runs"] + len(e["audit_skipped_bank_rows"]) == e[
            "audit_calls"
        ]
    # the oracle refactor is silicon-proven with the audit engaged
    r = s["R_oracle_refactor_onchip"]
    assert r["oracle_bitexact"] is True and r["audit_ran"] is True
    # negative results are ledgered as negative, not dropped
    assert s["Q_nbprune_verdict"]["verdict"].startswith("negative")


def test_hazards_ledger_invariants():
    h = _load("HAZARDS.json")
    txt = json.dumps(h)
    # all five real-chip hazard classes stay on the ledger
    for canary in ("H1", "H2", "H3", "H4", "H5"):
        assert canary in txt, f"hazard {canary} missing from HAZARDS.json"
