#!/usr/bin/env python3
"""ALU-packing micro-test completing the VERDICT r2 #7 proof.

If the VPU executed i16 (or i8) lane ops at 2x/4x the i32 rate, a Pallas
kernel accumulating |x-t| in i16 with periodic i32 spills could beat the
1.0 T elem/s stripe. This measures pure ALU throughput: a fused chain of
K dependent min(+)-ops per element over an HBM-resident array — HBM cost
is amortized over K, so the per-op rate at large K is the ALU rate.
Equal i16/i32 rates == no packing == the stripe is at the VPU's floor.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

_T0 = time.time()


def log(msg):
    print(f"[alu {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


N = 64 << 20  # elements
K = 64  # dependent ops per element


def chain(dtype):
    @jax.jit
    def f(x):
        y = x
        for i in range(K):
            y = jnp.minimum(y + dtype(i % 7 + 1), x + dtype(97))
        return y

    return f


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")
    key = jax.random.PRNGKey(9)
    for name, dt, jdt in (
        ("i32", np.int32, jnp.int32),
        ("i16", np.int16, jnp.int16),
        ("i8", np.int8, jnp.int8),
        ("f32", np.float32, jnp.float32),
    ):
        x = jax.random.randint(key, (N // (1 << 20), 1 << 20), 0, 100).astype(jdt)
        sync(x)
        f = chain(dt)
        sync(f(x))  # compile+warm

        def run(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = f(x)
            sync(out)
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(2))
        t2 = min(run(5) for _ in range(2))
        per = (t2 - t1) / 4
        rate = N * K * 2 / per / 1e12  # 2 ops (add+min) per chain step
        log(f"{name}: {per * 1e3:.1f} ms = {rate:.2f} T lane-ops/s")
    log("done")


if __name__ == "__main__":
    main()
