"""A/B harness for composite kernel variants on a real TPU chip
(historical: picked the pre-tiled-stack + pallas transpose path).

Run directly on a machine with the TPU attached; progress prints are
unbuffered so a watchdog can monitor the claim (see CLAUDE.md tunnel
rules).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
T0 = time.time()
def log(m): print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)
TS, NT, NBY, NBX, CH = 32, 100_000, 128, 4096, 128
S = TS * TS * 3
def sync(x): jax.device_get(x.reshape(-1)[0])

def _gather(items, aug):
    t = aug.shape[0] // 2
    flat = items.reshape(-1)
    rows = jnp.where(flat >= 0, flat - 1, t - flat - 1)
    sel = aug[jnp.clip(rows, 0, 2 * t - 1)]
    return jnp.where((flat == 0)[:, None], jnp.uint8(0), sel)

@functools.partial(jax.jit, static_argnames=("ts",))
def compose_v1(items, aug, *, ts):
    nby, nbx = items.shape
    sel = _gather(items, aug)
    band = sel.reshape(nby, nbx, ts, ts * 3)
    return jnp.transpose(band, (0, 2, 1, 3)).reshape(nby * ts, nbx * ts * 3)

@functools.partial(jax.jit, static_argnames=("ts",))
def compose_v4(items, aug, *, ts):  # i32-cast transpose
    nby, nbx = items.shape
    sel = _gather(items, aug)
    g = jax.lax.bitcast_convert_type(sel.reshape(nby, nbx, ts, ts * 3 // 4, 4), jnp.uint32)
    tr = jnp.transpose(g, (0, 2, 1, 3))
    out = jax.lax.bitcast_convert_type(tr, jnp.uint8)
    return out.reshape(nby * ts, nbx * ts * 3)

def tr_kernel(in_ref, out_ref):
    # in [CH, 8, 96] -> out [8, CH*96] via explicit per-tile row copies
    for c in range(CH):
        out_ref[:, c * 96 : (c + 1) * 96] = in_ref[c]

@functools.partial(jax.jit, static_argnames=("ts",))
def compose_v3d(items, aug, *, ts):
    nby, nbx = items.shape
    sel = _gather(items, aug).reshape(nby * nbx, ts, ts * 3)
    nj = nbx // CH
    ny = ts // 8
    out = pl.pallas_call(
        tr_kernel,
        grid=(nby, nj, ny),
        in_specs=[pl.BlockSpec(
            (CH, 8, 96),
            lambda i, j, y: (i * nj + j, y, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (8, CH * 96),
            lambda i, j, y: (i * ny + y, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nby * ts, nbx * ts * 3), jnp.uint8),
    )(sel)
    return out

key = jax.random.PRNGKey(0)
aug = jax.random.randint(key, (2 * NT, S), 0, 256, dtype=jnp.uint8)
items = jax.random.randint(jax.random.PRNGKey(1), (NBY, NBX), 1, NT + 1, dtype=jnp.int32)
sync(aug); log("inputs")
variants = {}
o1 = compose_v1(items, aug, ts=TS); sync(o1); log("v1 warm"); variants["v1"] = compose_v1
for name, fn in [("v4", compose_v4), ("v3d", compose_v3d)]:
    try:
        o = fn(items, aug, ts=TS); sync(o)
        eq = bool((np.asarray(jax.device_get(o[:32, :8192])) == np.asarray(jax.device_get(o1[:32, :8192]))).all())
        log(f"{name} warm, equal: {eq}")
        if eq: variants[name] = fn
    except Exception as e:
        log(f"{name} failed: {type(e).__name__}: {str(e)[:200]}")
for name, fn in variants.items():
    times = []
    for k in (2, 6):
        t0 = time.perf_counter()
        out = None
        for _ in range(k): out = fn(items, aug, ts=TS)
        sync(out)
        times.append(time.perf_counter() - t0)
    log(f"{name}: per-band {(times[1]-times[0])/4*1000:.1f} ms  (k2={times[0]:.3f} k6={times[1]:.3f})")

# match-phase breakdown
from emosaic_tpu.ops.lut import _build_l1_lut_jit
from emosaic_tpu.ops.analysis import _analyse_batch_2d
src = jax.random.randint(jax.random.PRNGKey(2), (4096, 4096 * 3), 0, 256, dtype=jnp.uint8)
pal = _analyse_batch_2d(aug[:NT], h=TS, w=TS, dim=1)
lib = jnp.concatenate([pal, pal], axis=0)
lut = _build_l1_lut_jit(lib.astype(jnp.int32)); sync(lut); log("lut warm")
@jax.jit
def lut_gather(src2d, lut):
    flat = src2d.reshape(-1, 3).astype(jnp.int32)
    idx = flat[:, 0] * 65536 + flat[:, 1] * 256 + flat[:, 2]
    return lut.reshape(-1)[idx].reshape(src2d.shape[0], -1)
gg = lut_gather(src, lut); sync(gg); log("lutgather warm")
for name, fn in [("lutbuild", lambda: _build_l1_lut_jit(lib.astype(jnp.int32))),
                 ("lutgather", lambda: lut_gather(src, lut)),
                 ("analysis", lambda: _analyse_batch_2d(aug[:NT], h=TS, w=TS, dim=1))]:
    times = []
    for k in (2, 8):
        t0 = time.perf_counter()
        out = None
        for _ in range(k): out = fn()
        sync(out)
        times.append(time.perf_counter() - t0)
    log(f"{name}: per-iter {(times[1]-times[0])/6*1000:.1f} ms")
log("DONE")
