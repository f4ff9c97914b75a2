#!/usr/bin/env python3
"""Consolidated real-chip numeric-hazard regression (VERDICT r3 #3).

Four hazard classes are known to pass CPU CI while corrupting results
ONLY on the real chip (docs/KERNELS.md "Round-3 measured hardware
facts"; each one was found the hard way):

  H1  MXU f32 dot rounds operands to bf16 unless Precision.HIGHEST
      (production site: the DMA-rescore reduction, ops/distance.py
      _l1_rows_kernel).
  H2  TPU fdiv is reciprocal+Newton (not correctly rounded) and XLA
      strength-reduces /const to *reciprocal on every backend
      (production site: ops/composite._u8_over_255_f32 — division-free).
  H3  FMA contraction skips the product's rounding, even across a bare
      optimization_barrier (production site: ops/composite._tint_blend_2d
      — products laundered through abs(-x)).
  H4  Pallas dynamic .at[row] DMA byte offsets wrap mod 2^32, so a
      single HBM buffer past 4 GiB aliases rows (production response:
      ops/distance._lib_banks power-of-two banks, each its own 64-bit
      base pointer; measured by tools/tpu_r21_dmalimit.py).
  H5  lax.map whose body dynamic-slices a multi-GiB closed-over operand
      miscompiles into LAST-ITERATION output aliasing at 2-bank 2M-row
      geometry — the round-4 false-certification (production response:
      ops/distance._ad_proj_bank_jit static slices + barrier chain;
      root-caused by tools/ad2m_aliasing_model.py).

For each class this tool asserts the PRODUCTION contract on the live
backend and records a CANARY showing whether the raw hazard is
observable there. Measured split (CPU selfcheck run): the /const
strength-reduction and bare-jit FMA contraction fire on EVERY backend
(consistent with docs/KERNELS.md — they are XLA codegen, not silicon);
the bf16 operand rounding (H1) and the non-IEEE runtime divide (H2
runtime_div_mismatches) are CHIP-ONLY and must fire on a TPU while
every production check passes. A TPU run where those two stay silent
means the probes no longer reach the hardware behavior they guard —
treat that as a rotted probe, not a fixed chip.

Run this after ANY kernel change, as the first link of a device-work
chain (CLAUDE.md). One process, self-bounded watchdog, <5 min warm
(fresh-process remote compiles add ~1-2 min). Writes HAZARDS.json.

usage: tpu_hazards.py [--cpu-selfcheck] [--out PATH]
  --cpu-selfcheck  force the CPU backend in-process and shrink H4 to an
                   interpret-mode banked run (validates the tool logic
                   anywhere).
  --out PATH       ledger path (default /root/repo/HAZARDS.json; CI uses
                   a tmp path so test runs never clobber the real ledger).
"""

import functools
import json
import os
import sys
import threading
import time
from fractions import Fraction

sys.path.insert(0, "/root/repo")

SELFCHECK = "--cpu-selfcheck" in sys.argv

import jax  # noqa: E402

if SELFCHECK:
    # CLAUDE.md rule 7: the env var is ignored once sitecustomize has
    # pinned the platform; the config update is honored.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from emosaic_tpu.ops import composite, distance  # noqa: E402

_T0 = time.time()
if "--out" in sys.argv:
    _i = sys.argv.index("--out")
    if _i + 1 >= len(sys.argv):
        sys.exit("usage: tpu_hazards.py [--cpu-selfcheck] [--out PATH]")
    OUT = sys.argv[_i + 1]
else:
    OUT = "/root/repo/HAZARDS.json"
RESULTS = {}


def log(msg):
    print(f"[hazards {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(jnp.ravel(x)[0])


def record(name, entry):
    RESULTS[name] = entry
    log(f"{name}: ok={entry.get('ok')} canary_fired={entry.get('canary_fired')}")


# ---------------------------------------------------------------------------
# H1: MXU f32 operand rounding
# ---------------------------------------------------------------------------


def check_mxu_dot():
    """Production contract: dot_general(HIGHEST) over integer-valued f32
    (values needing >8 mantissa bits, like the rescore's partial sums) is
    exact. Canary: the same dot at default precision differs.

    The canary dot is MXU-NATIVE-SHAPED ([128,128]x[128,128], the MXU's
    systolic tile): the first on-chip run of this tool (2026-08-19, TPU
    v5 lite) proved that the original (1,128)x(128,128) canary lowers to
    the VPU — M=1 vector-matrix products never touch the MXU, the VPU
    multiplies in full f32, and the bf16 operand-rounding canary stayed
    silent while the hazard (caught in round 3 on real [bc,D]x[D,L]
    rescore dots) still exists. The M=1 observation is kept as a
    recorded fact (`vec_dot_default_mismatches`), not a canary.
    Exactness envelope: A in (256, 512) needs 9 mantissa bits (bf16
    holds 8 -> rounds), B in [0, 128) is bf16-exact, every product
    <= 511*127 and every K=128 partial sum <= 8.4M < 2^24, so both the
    int64 oracle and the HIGHEST path are f32-exact."""
    rng = np.random.default_rng(7)
    a = rng.integers(257, 512, size=(128, 128)).astype(np.float32)
    b = rng.integers(0, 128, size=(128, 128)).astype(np.float32)
    want = a.astype(np.int64) @ b.astype(np.int64)

    def dot(p, lhs, rhs):
        return jax.jit(
            lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), precision=p
            )
        )(jnp.asarray(lhs), jnp.asarray(rhs))

    got_hi = np.asarray(jax.device_get(dot(jax.lax.Precision.HIGHEST, a, b)))
    got_def = np.asarray(jax.device_get(dot(None, a, b)))
    exact = (got_hi.astype(np.int64) == want).all()
    canary = int((got_def.astype(np.int64) != want).sum())

    # recorded observation: the old M=1 form (VPU-lowered, exact even at
    # default precision on v5e — see docstring)
    vals = rng.integers(0, 6121, size=(128, 128)).astype(np.float32)
    ones = np.ones((1, 128), np.float32)
    vwant = vals.astype(np.int64).sum(axis=1)
    vgot = np.asarray(
        jax.device_get(
            jax.jit(
                lambda x, y: jax.lax.dot_general(
                    x, y, (((1,), (1,)), ((), ()))
                )
            )(jnp.asarray(ones), jnp.asarray(vals))
        )
    )[0]
    return {
        "ok": bool(exact),
        "canary_fired": canary > 0,
        "default_precision_mismatches": canary,
        "max_abs_err_default": float(np.abs(got_def - want).max()),
        "vec_dot_default_mismatches": int(
            (vgot.astype(np.int64) != vwant).sum()
        ),
    }


# ---------------------------------------------------------------------------
# H2: fdiv correctness
# ---------------------------------------------------------------------------


def check_fdiv():
    """Production contract: _u8_over_255_f32(x) is bit-equal to the
    correctly-rounded fl32(x/255) for all 256 inputs. Canaries: a runtime
    f32 divide and a divide-by-constant both checked against the same
    correctly-rounded oracle (host x86 f32 division is IEEE)."""
    x = np.arange(256, dtype=np.uint8)
    want = (x.astype(np.float32) / np.float32(255.0)).view(np.uint32)
    got = np.asarray(
        jax.device_get(jax.jit(composite._u8_over_255_f32)(jnp.asarray(x)))
    ).view(np.uint32)
    ok = (got == want).all()

    xf = jnp.asarray(x.astype(np.float32))
    run_div = np.asarray(
        jax.device_get(jax.jit(lambda a, d: a / d)(xf, jnp.float32(255.0)))
    ).view(np.uint32)
    const_div = np.asarray(
        jax.device_get(jax.jit(lambda a: a / np.float32(255.0))(xf))
    ).view(np.uint32)
    c_run = int((run_div != want).sum())
    c_const = int((const_div != want).sum())
    return {
        "ok": bool(ok),
        "canary_fired": (c_run + c_const) > 0,
        "runtime_div_mismatches": c_run,
        "const_div_mismatches": c_const,
    }


# ---------------------------------------------------------------------------
# H3: FMA contraction
# ---------------------------------------------------------------------------


def _f32_round(frac: Fraction) -> np.float32:
    """Correctly-rounded (RNE) f32 of an exact rational, via the f64
    midpoint test: f64 holds >2x f32's mantissa, so converting the exact
    value to f64 then f32 only double-rounds when the exact value sits
    within f64-eps of an f32 rounding boundary — which the Fraction
    comparison below resolves exactly."""
    lo = np.float32(np.float64(frac.numerator) / np.float64(frac.denominator))
    # exact nearest: compare |frac - cand| across the three f32 neighbors
    cands = [
        np.nextafter(lo, np.float32(-np.inf)),
        lo,
        np.nextafter(lo, np.float32(np.inf)),
    ]
    best = min(cands, key=lambda c: abs(frac - Fraction(float(c))))
    return np.float32(best)


def check_fma():
    """Production contract: the abs(-x) laundering idiom
    (ops/composite._tint_blend_2d) yields one-rounding-per-op results.
    Canary: a bare jit a*b+c fuses into FMA (result == correctly-rounded
    fused, != rounded-product path) on hardware that contracts."""
    rng = np.random.default_rng(11)
    # triples where fl32(fl32(a*b)+c) != RNE(a*b+c exactly): FMA visible
    triples = []
    while len(triples) < 64:
        a, b, c = rng.uniform(0.25, 1.0, 3).astype(np.float32)
        rounded = np.float32(np.float32(a * b) + c)
        exact = Fraction(float(a)) * Fraction(float(b)) + Fraction(float(c))
        fused = _f32_round(exact)
        if rounded.view(np.uint32) != fused.view(np.uint32):
            triples.append((a, b, c, rounded, fused))
    A, B, C, R, F = (np.array(t, np.float32) for t in zip(*triples))

    def laundered(a, b, c):
        prod = jnp.abs(-(a * b))
        prod, c = jax.lax.optimization_barrier((prod, c))
        return prod + c

    got_l = np.asarray(
        jax.device_get(
            jax.jit(laundered)(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C))
        )
    )
    got_bare = np.asarray(
        jax.device_get(
            jax.jit(lambda a, b, c: a * b + c)(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)
            )
        )
    )
    ok = (got_l.view(np.uint32) == R.view(np.uint32)).all()
    fired = int((got_bare.view(np.uint32) == F.view(np.uint32)).sum())

    # Production-context canary: the tint kernel's exact expression with
    # the laundering REMOVED — two bare products feeding one add inside
    # the full fused u8->f32->blend->u8 kernel, against the host oracle.
    # This is the shape in which round 3 caught contraction on silicon
    # (ops/composite._tint_blend_2d docstring); the tiny standalone
    # a*b+c above did NOT contract on TPU v5 lite (2026-08-19 run) while
    # it does on CPU, so context size/structure demonstrably changes
    # codegen. fdiv is excluded (the kernel is division-free), so any
    # mismatch here is contraction/reassociation of the mul-mul-add.
    m = np.broadcast_to(
        np.arange(256, dtype=np.uint8)[:, None, None], (256, 256, 3)
    ).reshape(256, 768)
    s = np.broadcast_to(
        np.arange(256, dtype=np.uint8)[None, :, None], (256, 256, 3)
    ).reshape(256, 768)
    tint_fired = {}
    for alpha in (64, 127, 128, 132, 255):
        mt, fg_a, inv, af = composite.tint_scalars(alpha)
        bump = bool(af != np.float32(1.0))

        # mt/bump bound as defaults: the closure is jitted and invoked in
        # this iteration today, but a refactor that collects the jitted
        # fns and runs them later would otherwise see only the last
        # iteration's scalars (ADVICE r4)
        def naive(bg, fg, fa, iv, mt=mt, bump=bump):
            fg_r = composite._u8_over_255_f32(fg)
            bg_r = composite._u8_over_255_f32(bg)
            t = fg_r * fa + (bg_r * jnp.float32(1.0)) * iv
            if bump:
                tb = jax.lax.bitcast_convert_type(t, jnp.uint32)
                tu = jax.lax.bitcast_convert_type(
                    tb + jnp.uint32(1), jnp.float32
                )
                t = jnp.where(t == 0, t, tu)
            return jnp.clip(
                jnp.trunc(jnp.float32(mt) * t), 0, 255
            ).astype(jnp.uint8)

        got_naive = np.asarray(
            jax.device_get(
                jax.jit(naive)(
                    jnp.asarray(m),
                    jnp.asarray(s),
                    jnp.float32(fg_a),
                    jnp.float32(inv),
                )
            )
        )
        ref = composite.ref_tint_blend_u8(
            m.reshape(256, 256, 3), s.reshape(256, 256, 3), alpha
        ).reshape(256, 768)
        diffs = int((got_naive != ref).sum())
        if diffs:
            tint_fired[str(alpha)] = diffs
    return {
        "ok": bool(ok),
        "canary_fired": fired > 0 or bool(tint_fired),
        "bare_jit_fused_count": fired,
        "n_triples": len(triples),
        "tint_unlaundered_mismatches": tint_fired,
    }


# ---------------------------------------------------------------------------
# H2+H3 end-to-end: the exhaustive tint oracle (the check that originally
# caught both on silicon)
# ---------------------------------------------------------------------------


def check_tint(alphas):
    m = np.broadcast_to(
        np.arange(256, dtype=np.uint8)[:, None, None], (256, 256, 3)
    )
    s = np.broadcast_to(
        np.arange(256, dtype=np.uint8)[None, :, None], (256, 256, 3)
    )
    bad = {}
    for alpha in alphas:
        ref = composite.ref_tint_blend_u8(m, s, alpha)
        got = np.asarray(composite.tint_blend(m, s, (alpha + 0.5) / 255.0))
        diffs = int((got != ref).sum())
        if diffs:
            bad[str(alpha)] = diffs
    return {
        "ok": not bad,
        "canary_fired": None,  # contract-only: the oracle IS the check
        "alphas_checked": len(alphas),
        "pairs_per_alpha": 65536,
        "mismatched_alphas": bad,
    }


# ---------------------------------------------------------------------------
# H4: DMA 4 GiB row-offset wrap through the production banked path
# ---------------------------------------------------------------------------


def _content_np(rows, d):
    r = np.asarray(rows, np.int64)[:, None]
    trip = np.concatenate([r & 255, (r >> 8) & 255, (r >> 16) & 255], 1)
    return np.tile(trip, (1, d // 3)).astype(np.uint8)


def _plant_self_indexing(lp, d):
    """Device-generate a self-indexing [lp, d] library (row r's content
    encodes r in repeated byte triples) split per production bank math
    (`_lib_banks` geometry, no tunnel uploads). Shared by H4 and H5."""
    rb = distance._dma_bank_rows(distance._pad_width(d))
    nb = -(-lp // rb)
    nc = d // 3
    ck = min(rb, 1 << 17)

    @functools.partial(jax.jit, static_argnames=("n",))
    def make_chunk(r0, *, n):
        ids = r0 + jnp.arange(n, dtype=jnp.int32)[:, None]
        trip = jnp.concatenate(
            [ids & 255, (ids >> 8) & 255, (ids >> 16) & 255], 1
        )
        return jnp.tile(trip, (1, nc)).astype(jnp.uint8)

    place = jax.jit(
        lambda a, c, r0: jax.lax.dynamic_update_slice(a, c, (r0, 0)),
        donate_argnums=0,
    )
    banks = []
    for bi in range(nb):
        n = min(rb, lp - bi * rb)
        bk = jnp.zeros((n, d), jnp.uint8)
        for c0 in range(0, n, ck):
            cn = min(ck, n - c0)
            bk = place(
                bk,
                make_chunk(jnp.int32(bi * rb + c0), n=cn),
                jnp.int32(c0),
            )
        sync(bk)
        banks.append(bk)
    return tuple(banks), rb, nb


def check_dma_banks(selfcheck: bool):
    """Self-indexing library spanning the 4 GiB global-offset boundary,
    split per production bank math, fetched row-exactly through
    _l1_rows_dma. Device-generated (no tunnel uploads). Contract: every
    self-match distance is 0 and a cross-row fetch returns the exact
    analytic distance (guards a kernel that degenerately returns 0)."""
    d = 3072
    if selfcheck:
        # shrink: force 2 banks via a tiny limit, run interpret mode
        saved = distance._DMA_LIB_BYTES_MAX
        distance._DMA_LIB_BYTES_MAX = 512 * d
        interpret = True
        lp = 1024
    else:
        saved = None
        interpret = False
        lp = 1_572_864  # 1.5 * 2^20 rows x 3072 B = 4.83 GB > 4 GiB
    try:
        banks, rb, nb = _plant_self_indexing(lp, d)
        assert rb & (rb - 1) == 0 and rb * distance._pad_width(d) <= (
            distance._DMA_LIB_BYTES_MAX
        )
        assert nb >= 2, (lp, rb)
        log(f"H4 library planted: {lp} rows x {d} B in {nb} banks (rb={rb})")

        # probe rows: bank boundaries + the 2^32 global-offset crossing
        wrap_row = (1 << 32) // d
        rows = sorted(
            set(
                r
                for r in (
                    0,
                    rb - 1,
                    rb,
                    min(wrap_row - 128, lp - 1),
                    min(wrap_row + 128, lp - 1),
                    lp - 1,
                )
                if 0 <= r < lp
            )
        )
        m = 128
        blocks = jnp.asarray(_content_np(rows, d))
        cand = jnp.asarray(
            np.asarray(rows, np.int32)[:, None].repeat(m, 1)
        )
        mc = distance._rows_dma_mc(m, d)
        dist = np.asarray(
            jax.device_get(
                distance._l1_rows_dma(
                    blocks, cand, banks, mc=mc, interpret=interpret
                )
            )
        )
        self_ok = (dist == 0).all()

        # cross check: fetch row[-1] against row[0]'s content
        cross_want = int(
            np.abs(
                _content_np([rows[-1]], d).astype(np.int32)
                - _content_np([rows[0]], d).astype(np.int32)
            ).sum()
        )
        cand2 = jnp.asarray(
            np.full((1, m), rows[-1], np.int32)
        )
        dist2 = np.asarray(
            jax.device_get(
                distance._l1_rows_dma(
                    blocks[:1], cand2, banks, mc=mc, interpret=interpret
                )
            )
        )
        cross_ok = (dist2 == cross_want).all() and cross_want > 0
        return {
            "ok": bool(self_ok and cross_ok),
            "canary_fired": None,  # the raw-wrap canary is the r21 probe
            # (it needs a >4 GiB SINGLE buffer, which doubles this
            # check's footprint; see tools/tpu_r21_dmalimit.py)
            "rows_probed": rows,
            "bank_rows": rb,
            "n_banks": nb,
            "self_match_max_dist": int(dist.max()),
            "cross_dist": int(dist2[0, 0]),
            "cross_want": cross_want,
        }
    finally:
        if saved is not None:
            distance._DMA_LIB_BYTES_MAX = saved


# ---------------------------------------------------------------------------
# H5: lax.map(dynamic_slice) scan-output aliasing at multi-bank geometry
# ---------------------------------------------------------------------------


def check_scan_alias(selfcheck: bool):
    """The round-4 2M-row false-certification class (SCALE_r03
    L3_ad2M_diag_partial; root-caused by tools/ad2m_aliasing_model.py):
    a `lax.map` whose body dynamic-slices a multi-GiB closed-over
    operand miscompiled on TPU into LAST-ITERATION output aliasing —
    every projection chunk held chunk 7's values at the same in-chunk
    offset, only at the 2-bank 2M-row geometry.

    Production contract: `_ad_proj_bank_jit` (static slices +
    optimization_barrier chain) projects a self-indexing library
    bit-exactly at the EXACT geometry that fired (2 banks, 2M rows,
    3072 B rows). Canary: the replaced scan-form projection re-run on
    the same banks, mismatch counts per chunk (fired = any chunk wrong;
    the observed signature is chunks 0-6 bad / chunk 7 good per bank).
    Self-indexing content makes the expected projection analytic
    (proj[r] = repeat([g*b0, g*b1, g*b2])), so verification is one
    on-device compare per bank — no host pulls beyond 8 counters.
    Version-dependent, like H4's wrap: this entry dates the stack."""
    d = 3072
    if selfcheck:
        saved = distance._DMA_LIB_BYTES_MAX
        distance._DMA_LIB_BYTES_MAX = 512 * d
        lp = 1024
    else:
        saved = None
        lp = 2_000_000  # the firing geometry: 2 banks (2^20 + 951424 rows)
    try:
        nc = d // 3
        g = next(
            gg
            for gg in distance._AD_GROUPS
            if nc % gg == 0 and (nc // gg) * 3 >= 4
        )
        banks, rb, nb = _plant_self_indexing(lp, d)
        assert nb >= 2, (lp, rb)
        log(f"H5 library planted: {lp} rows x {d} B in {nb} banks (rb={rb})")

        def scan_proj(bf, rows):
            """The PRE-FIX `_ad_coarse_jit` projection, verbatim scan
            form (the reproducer)."""
            n8 = rows // 8
            return jax.lax.map(
                lambda i: distance._ad_project(
                    jax.lax.dynamic_slice(
                        bf, (i * (n8 * d),), (n8 * d,)
                    ).reshape(n8, d),
                    d,
                    g,
                    True,
                ),
                jnp.arange(8, dtype=jnp.int32),
            ).reshape(rows, -1)

        @functools.partial(jax.jit, static_argnames=("rows",))
        def bad_per_chunk(proj, r0, *, rows):
            """On-device compare against the analytic projection of the
            self-indexing content: [8] wrong-row counts per chunk."""
            ids = r0 + jnp.arange(rows, dtype=jnp.int32)[:, None]
            trip = jnp.concatenate(
                [ids & 255, (ids >> 8) & 255, (ids >> 16) & 255], 1
            )
            exp = jnp.tile(trip * g, (1, nc // g))
            bad = (proj != exp).any(axis=1)
            return bad.reshape(8, -1).sum(axis=1, dtype=jnp.int32)

        scan_bad, prod_bad = [], []
        r0 = 0
        for bk in banks:
            rows = bk.shape[0]
            bf = bk.reshape(-1)
            p_scan = jax.jit(scan_proj, static_argnames=("rows",))(
                bf, rows=rows
            )
            scan_bad.append(
                np.asarray(
                    jax.device_get(bad_per_chunk(p_scan, r0, rows=rows))
                )
            )
            del p_scan
            p_prod = distance._ad_proj_bank_jit(bf, d=d, g=g, chan=True)
            prod_bad.append(
                np.asarray(
                    jax.device_get(bad_per_chunk(p_prod, r0, rows=rows))
                )
            )
            del p_prod, bf
            r0 += rows
        scan_bad = np.stack(scan_bad)
        prod_bad = np.stack(prod_bad)
        return {
            "ok": bool((prod_bad == 0).all()),
            "canary_fired": bool((scan_bad > 0).any()),
            "lp": lp,
            "n_banks": nb,
            "scan_bad_per_chunk": scan_bad.tolist(),
            "prod_bad_per_chunk": prod_bad.tolist(),
        }
    finally:
        if saved is not None:
            distance._DMA_LIB_BYTES_MAX = saved


# ---------------------------------------------------------------------------


def main():
    def watchdog():
        time.sleep(1500 if SELFCHECK else 2700)
        log("watchdog fired; writing partial ledger and exiting")
        RESULTS["watchdog_fired"] = True
        with open(OUT, "w") as f:
            json.dump(RESULTS, f, indent=1)
        os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    RESULTS["platform"] = dev.platform
    # stack versions: hazard manifestations are runtime-version-dependent
    # (the 2026-08-19 post-outage stack stopped wrapping >4 GiB DMA
    # offsets and stopped contracting standalone mul+add — drift this
    # ledger must date)
    RESULTS["jax_version"] = jax.__version__
    try:
        import importlib.metadata as _md

        RESULTS["libtpu_version"] = _md.version("libtpu")
    except Exception:
        RESULTS["libtpu_version"] = None
    RESULTS["device_kind"] = dev.device_kind
    RESULTS["selfcheck"] = SELFCHECK
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")

    record("H1_mxu_dot", check_mxu_dot())
    record("H2_fdiv", check_fdiv())
    record("H3_fma", check_fma())
    alphas = (0, 1, 64, 127, 128, 132, 255) if SELFCHECK else range(256)
    record("H23_tint_exhaustive", check_tint(alphas))
    record("H4_dma_banks", check_dma_banks(SELFCHECK))
    record("H5_scan_alias", check_scan_alias(SELFCHECK))

    checks = [v for v in RESULTS.values() if isinstance(v, dict) and "ok" in v]
    all_ok = all(v["ok"] for v in checks)
    canaries = {
        k: v["canary_fired"]
        for k, v in RESULTS.items()
        if isinstance(v, dict) and v.get("canary_fired") is not None
    }
    RESULTS["all_ok"] = all_ok
    RESULTS["any_canary_fired"] = any(canaries.values())
    # the two CHIP-ONLY canaries (see module docstring): on a real TPU
    # both must fire or the probes have rotted
    chip_only_fired = bool(
        RESULTS["H1_mxu_dot"]["canary_fired"]
        and RESULTS["H2_fdiv"]["runtime_div_mismatches"] > 0
    )
    RESULTS["chip_only_canaries_fired"] = chip_only_fired
    if dev.platform not in ("cpu",) and not chip_only_fired:
        log(
            "WARNING: a chip-only canary stayed silent on a non-CPU "
            "backend — the probes may no longer reach the hardware "
            "behaviors they guard"
        )
        RESULTS["canary_warning"] = True
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"all_ok={all_ok} canaries={canaries}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
