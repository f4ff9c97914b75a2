"""Validate the Pallas L1 kernel bit-exact vs the XLA oracle on a real
TPU chip across feature dims (modes 8/32/128), plus a throughput probe.

Run directly on a machine with the TPU attached; progress prints are
unbuffered so a watchdog can monitor the claim (see CLAUDE.md tunnel
rules).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import time
import numpy as np
import jax
T0 = time.time()
def log(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
from emosaic_tpu.ops.distance import l1_argmin, l1_argmin_xla, build_library
rng = np.random.default_rng(7)
log("inputs")  # marker
for n_cells, t, b in [(64, 300, 700), (1024, 64, 256), (16384, 24, 96)]:
    d = n_cells * 3
    pal = rng.integers(0, 256, size=(t, n_cells, 3), dtype=np.uint8)
    lib = np.asarray(build_library(pal))
    blocks = rng.integers(0, 256, size=(b, d), dtype=np.uint8)
    t0 = time.time()
    d1, r1 = l1_argmin(blocks, lib)
    jax.device_get(d1[0])
    t_pal = time.time() - t0
    d2, r2 = l1_argmin_xla(blocks, lib)
    ok_d = bool((np.asarray(d1) == np.asarray(d2)).all())
    ok_r = bool((np.asarray(r1) == np.asarray(r2)).all())
    log(f"D={d}: pallas==xla dist={ok_d} row={ok_r} (pallas warm {t_pal:.1f}s)")
# pallas timing at production-ish scale: mode 2 (D=12), 65k lib, 1M blocks
d = 12
pal = rng.integers(0, 256, size=(32767, 4, 3), dtype=np.uint8)
lib = np.asarray(build_library(pal))
blocks = rng.integers(0, 256, size=(1_000_000, d), dtype=np.uint8)
t0 = time.time(); d1, r1 = l1_argmin(blocks, lib); jax.device_get(d1[0]); log(f"warm 1M x 65k D=12: {time.time()-t0:.1f}s")
for k in (1, 3):
    t0 = time.time()
    for _ in range(k):
        dd, rr = l1_argmin(blocks, lib)
    jax.device_get(dd[0])
    if k == 1: t1 = time.time() - t0
    else: t3 = time.time() - t0
per = (t3 - t1) / 2
log(f"pallas 1M blocks x 65534 rows x D=12: {per:.3f}s -> {1e6*65534*2/per/1e12:.2f} T cmp/s")
log("DONE")

# DMA shortlist-rescore parity (the kernel whose MXU dot silently ran at
# bf16 default precision until round 3 — tools/tpu_r7_dma_debug.py):
# validate on every alignment class incl. the zero-padded mid-D route.
import jax.numpy as jnp
from emosaic_tpu.ops.distance import _l1_rows_dma, _rows_dma_mc
for dd_ in (768, 1024, 3072):
    b_, lp_, m_ = 64, 2048, 128
    key = jax.random.PRNGKey(dd_)
    k1, k2, k3 = jax.random.split(key, 3)
    blocks_ = jax.random.randint(k1, (b_, dd_), 0, 256, dtype=jnp.uint8)
    libp_ = jax.random.randint(k2, (lp_, dd_), 0, 256, dtype=jnp.uint8)
    cand_ = jax.random.randint(k3, (b_, m_), 0, lp_, dtype=jnp.int32)
    got = np.asarray(jax.device_get(
        _l1_rows_dma(blocks_, cand_, libp_, mc=_rows_dma_mc(m_, dd_))
    ))
    bn, ln, cn = (np.asarray(jax.device_get(x)) for x in (blocks_, libp_, cand_))
    ref = np.abs(
        bn.astype(np.int64)[:, None, :] - ln.astype(np.int64)[cn]
    ).sum(-1).astype(np.int32)
    log(f"rows_dma D={dd_}: exact={bool((got == ref).all())}")
log("DONE2")
