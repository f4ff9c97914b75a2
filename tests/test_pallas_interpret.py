"""CPU CI coverage of the Pallas kernel *bodies* via interpret mode.

On CPU the production dispatchers fall back to XLA, so without these tests
a regression in _l1_kernel / _tr_kernel / _dma_kernel would leave the
suite green (VERDICT r1 weak #2). `pl.pallas_call(interpret=True)` executes
the kernels through the Pallas interpreter, including the scalar-prefetch
DMA path. Oracle: the pure-XLA implementations, themselves parity-tested
against the reference semantics (tests/test_render.py B/W universe,
mod.rs:83-161).
"""

import numpy as np
import pytest

from emosaic_tpu.ops import composite, distance


@pytest.mark.parametrize(
    "b,l,d",
    [
        (1, 3, 3),  # tiny, heavy padding on every axis
        (5, 700, 12),  # l crosses one _L_TILE boundary
        (300, 513, 12),  # b crosses _B_TILE; l pads to 2 tiles
        (70, 100, 200),  # d crosses _D_CHUNK (multi d-chunk accumulation)
    ],
)
def test_l1_argmin_pallas_interpret_matches_xla(rng, b, l, d):
    blocks = rng.integers(0, 256, size=(b, d), dtype=np.uint8)
    lib = rng.integers(0, 256, size=(l, d), dtype=np.uint8)
    dist_p, row_p = distance._l1_argmin_pallas(blocks, lib, interpret=True)
    dist_x, row_x = distance.l1_argmin_xla(blocks, lib)
    np.testing.assert_array_equal(np.asarray(dist_p), np.asarray(dist_x))
    np.testing.assert_array_equal(np.asarray(row_p), np.asarray(row_x))


def test_l1_argmin_pallas_interpret_tie_break_lowest_row(rng):
    # duplicate rows force exact ties; the contract is lowest-row-wins
    # (ops/distance.py module docstring; SURVEY.md section 6)
    d = 12
    base = rng.integers(0, 256, size=(40, d), dtype=np.uint8)
    lib = np.concatenate([base, base, base], axis=0)  # every row tied x3
    blocks = base[rng.integers(0, 40, size=17)]
    dist_p, row_p = distance._l1_argmin_pallas(blocks, lib, interpret=True)
    assert np.all(np.asarray(dist_p) == 0)
    assert np.all(np.asarray(row_p) < 40)
    dist_x, row_x = distance.l1_argmin_xla(blocks, lib)
    np.testing.assert_array_equal(np.asarray(row_p), np.asarray(row_x))


def _composite_case(rng, nby=3, nbx=composite._CH, t=5, ts=8):
    stack = rng.integers(0, 256, size=(t, ts, ts, 3), dtype=np.uint8)
    items = rng.integers(-t, t + 1, size=(nby, nbx)).astype(np.int32)
    items[0, 0] = 0  # unassigned -> black row
    items[0, 1] = -t  # flipped extreme
    items[0, 2] = t
    aug3, _ = composite.augment_stack2d(stack)
    import jax.numpy as jnp

    return jnp.asarray(items), aug3, ts


def test_compose_rows_pallas_interpret_matches_xla(rng):
    items, aug3, ts = _composite_case(rng)
    out_p = composite._compose_rows_pallas(items, aug3, ts=ts, interpret=True)
    out_x = composite._compose_rows_xla(items, aug3, ts=ts)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_compose_rows_dma_interpret_matches_xla(rng):
    items, aug3, ts = _composite_case(rng, nby=2)
    out_d = composite._compose_rows_dma(items, aug3, ts=ts, interpret=True)
    out_x = composite._compose_rows_xla(items, aug3, ts=ts)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_x))


def test_compose_rows_dma_interpret_multi_step_grid(rng):
    # multi-step grid (nby=3 x nj=2) so the unrolled issue loop's
    # scalar-prefetch base advances across steps
    items, aug3, ts = _composite_case(rng, nby=3, nbx=2 * composite._CH)
    out_d = composite._compose_rows_dma(items, aug3, ts=ts, interpret=True)
    out_x = composite._compose_rows_xla(items, aug3, ts=ts)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_x))


def test_compose_dma_dispatch_respects_stack_limit(monkeypatch, rng):
    """Stacks past the DMA addressing limit must be denied the DMA fast
    path (they would fetch mod-2^32-aliased tile rows) and the direct
    call must refuse; the pallas/XLA routes stay exact for the same
    stack."""
    items, aug3, ts = _composite_case(rng, nby=2)
    assert composite._dma_dispatch_ok(2, composite._CH, ts, aug3.size)
    monkeypatch.setattr(composite, "_DMA_STACK_BYTES_MAX", aug3.size - 1)
    assert not composite._dma_dispatch_ok(2, composite._CH, ts, aug3.size)
    with pytest.raises(ValueError, match="addressing limit"):
        composite._compose_rows_dma(items, aug3, ts=ts, interpret=False)
    # interpret mode (no DMA engine) and the fallback path still run
    out_d = composite._compose_rows_dma(items, aug3, ts=ts, interpret=True)
    out_p = composite._compose_rows_pallas(items, aug3, ts=ts, interpret=True)
    out_x = composite._compose_rows_xla(items, aug3, ts=ts)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_x))
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


@pytest.mark.parametrize(
    "b,lp,d,m",
    [
        (4, 128, 48, 8),  # mc < lanes
        (9, 256, 128, 32),  # odd b
        (16, 384, 256, 16),  # multi-lane rows
        (6, 256, 768, 16),  # mid-D: zero-padded to the 1024 alignment
    ],
)
def test_l1_rows_dma_interpret_matches_gather(rng, b, lp, d, m):
    """The DMA-fused shortlist rescore kernel (adaptive no-repeat scorer)
    must equal the XLA row-gather distance on arbitrary candidate sets."""
    import jax.numpy as jnp

    blocks = rng.integers(0, 256, size=(b, d), dtype=np.uint8)
    libp = rng.integers(0, 256, size=(lp, d), dtype=np.uint8)
    cand = rng.integers(0, lp, size=(b, m)).astype(np.int32)
    cand[0, :3] = [0, lp - 1, 0]  # boundary + repeated rows
    mc = distance._rows_dma_mc(m, d)
    got = distance._l1_rows_dma(
        jnp.asarray(blocks), jnp.asarray(cand), jnp.asarray(libp),
        mc=mc, interpret=True,
    )
    ref = np.abs(
        blocks.astype(np.int64)[:, None, :]
        - libp.astype(np.int64)[cand]
    ).sum(-1)
    np.testing.assert_array_equal(np.asarray(got), ref.astype(np.int32))


def test_l1_rows_dma_banked_interpret_matches_gather(rng):
    """Banked library form (DMA addressing limit, _DMA_LIB_BYTES_MAX):
    the predicated per-bank issue loop must fetch the same rows as the
    single-buffer form for candidates spanning every bank, including
    bank-boundary rows and a smaller ragged last bank."""
    import jax.numpy as jnp

    b, d, m, rb = 6, 128, 16, 128
    rows = [rb, rb, 64]  # ragged last bank
    lp = sum(rows)
    blocks = rng.integers(0, 256, size=(b, d), dtype=np.uint8)
    libp = rng.integers(0, 256, size=(lp, d), dtype=np.uint8)
    cand = rng.integers(0, lp, size=(b, m)).astype(np.int32)
    cand[0, :6] = [0, rb - 1, rb, 2 * rb - 1, 2 * rb, lp - 1]
    banks = []
    o = 0
    for r in rows:
        banks.append(jnp.asarray(libp[o : o + r]))
        o += r
    mc = distance._rows_dma_mc(m, d)
    got = distance._l1_rows_dma(
        jnp.asarray(blocks), jnp.asarray(cand), tuple(banks),
        mc=mc, interpret=True,
    )
    single = distance._l1_rows_dma(
        jnp.asarray(blocks), jnp.asarray(cand), jnp.asarray(libp),
        mc=mc, interpret=True,
    )
    ref = np.abs(
        blocks.astype(np.int64)[:, None, :] - libp.astype(np.int64)[cand]
    ).sum(-1)
    np.testing.assert_array_equal(np.asarray(got), ref.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(single))


def test_dma_bank_rows_boundary_math():
    """_dma_bank_rows picks the largest power-of-two row count whose bank
    stays within the addressing limit: rb*dp <= LIMIT < 2*rb*dp. At the
    flagship D=3072 this is exactly 2^20 rows (a 3 GiB bank, matching the
    measured-exact 1M-row single-buffer run), and a bank may land exactly
    AT the 4 GiB limit (row rb-1's byte offset is LIMIT - dp < 2^32)."""
    limit = distance._DMA_LIB_BYTES_MAX
    for dp in (3072, 1024, 2048, 49152, 768):
        rb = distance._dma_bank_rows(dp)
        assert rb & (rb - 1) == 0
        assert rb * dp <= limit < 2 * rb * dp
    assert distance._dma_bank_rows(3072) == 1 << 20
    # power-of-two dp fills the limit exactly — allowed (offsets < 2^32)
    assert distance._dma_bank_rows(1024) * 1024 == limit


def test_lib_banks_split_and_reassemble(monkeypatch, rng):
    """_lib_banks honors the byte ceiling: power-of-two full banks whose
    rows stay multiples of 128, a smaller last bank, exact content; and a
    single bank (the proven path) below the limit."""
    d = 48  # not % 128 -> dp = d
    lp = 128 * 7
    lib = rng.integers(0, 256, size=(lp, d), dtype=np.uint8)
    one = distance._lib_banks(lib, d)
    assert len(one) == 1 and one[0].size == lp * d
    monkeypatch.setattr(distance, "_DMA_LIB_BYTES_MAX", 2 * 128 * d)
    banks = distance._lib_banks(lib, d)
    assert [bf.size // d for bf in banks] == [256, 256, 256, 128]
    joined = np.concatenate([np.asarray(bf).reshape(-1, d) for bf in banks])
    np.testing.assert_array_equal(joined, lib)


def test_rows_dma_refuses_oversized_bank(monkeypatch, rng):
    """A bank past the DMA row-offset addressing limit must raise (the
    wrap returns mod-2^32-aliased rows SILENTLY — SCALE_r03 M_dma_limit),
    never compute; interpret mode (no real DMA engine) stays exempt."""
    import jax.numpy as jnp

    b, d, m = 2, 128, 8
    lib = jnp.asarray(rng.integers(0, 256, size=(256, d), dtype=np.uint8))
    blocks = jnp.asarray(rng.integers(0, 256, size=(b, d), dtype=np.uint8))
    cand = jnp.asarray(rng.integers(0, 256, size=(b, m)).astype(np.int32))
    monkeypatch.setattr(distance, "_DMA_LIB_BYTES_MAX", 128 * 1024)
    with pytest.raises(ValueError, match="addressing limit"):
        distance._l1_rows_dma(blocks, cand, lib, mc=m, interpret=False)
    # interpret path still runs (CPU oracle has no addressing limit)
    distance._l1_rows_dma(blocks, cand, lib, mc=m, interpret=True)


def test_ad_scorer_banked_library_bit_identical(rng):
    """The adaptive-scorer jits accept the banked library tuple and must
    produce bit-identical (dists, rows, ok) to the single-flat form (the
    gather rescore path; the DMA path's bank parity is pinned above)."""
    import jax.numpy as jnp

    b, l, d, g, cap, m, k = 16, 2000, 48, 4, 4, 32, 6
    lp = -(-l // 128) * 128  # 2048 -> two 1024-row banks
    lib = rng.integers(0, 256, size=(l, d), dtype=np.uint8)
    blocks = lib[rng.integers(0, l, size=b)]
    lib_pad = np.zeros((lp, d), np.uint8)
    lib_pad[:l] = lib
    bf = jnp.asarray(blocks.reshape(-1))
    lf = jnp.asarray(lib_pad.reshape(-1))
    lf2 = (
        jnp.asarray(lib_pad[:1024].reshape(-1)),
        jnp.asarray(lib_pad[1024:].reshape(-1)),
    )
    outs = []
    for lib_arg in (lf, lf2):
        vals, cols, s_min = distance._ad_coarse_jit(
            bf, lib_arg, d=d, g=g, chan=True, bc=8, cap=cap, real_l=l
        )
        outs.append(
            distance._ad_rescore_jit(
                bf, vals, cols, s_min, lib_arg,
                d=d, bc=8, m=m, k=k, real_l=l, use_dma=False,
            )
        )
    for a, bb in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_ad_scorer_ragged_banks_bit_identical(monkeypatch, rng):
    """Same bit-identity with a RAGGED `_lib_banks` split (full
    power-of-two banks + a smaller last) — the shape class the 2M-row
    library produces ([2^20, 951424] rows at D=3072); the coarse
    projection's per-bank 8-way chunking must handle the short bank."""
    import jax.numpy as jnp

    b, l, d, g, cap, m, k = 16, 2250, 48, 4, 4, 32, 6
    lp = -(-l // 128) * 128  # 2304
    lib = rng.integers(0, 256, size=(l, d), dtype=np.uint8)
    blocks = lib[rng.integers(0, l, size=b)]
    lib_pad = np.zeros((lp, d), np.uint8)
    lib_pad[:l] = lib
    bf = jnp.asarray(blocks.reshape(-1))
    lf = jnp.asarray(lib_pad.reshape(-1))
    monkeypatch.setattr(distance, "_DMA_LIB_BYTES_MAX", 50_000)
    banks = distance._lib_banks(lib_pad, d)  # rb=1024 -> [1024, 1024, 256]
    assert [bk.size // d for bk in banks] == [1024, 1024, 256]
    outs = []
    for lib_arg in (lf, banks):
        vals, cols, s_min = distance._ad_coarse_jit(
            bf, lib_arg, d=d, g=g, chan=True, bc=8, cap=cap, real_l=l
        )
        outs.append(
            distance._ad_rescore_jit(
                bf, vals, cols, s_min, lib_arg,
                d=d, bc=8, m=m, k=k, real_l=l, use_dma=False,
            )
        )
    for a, bb in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_ad_rescore_dma_path_equivalent(rng):
    """The DMA rescore path must reach the same (dists, rows, ok) as
    _ad_rescore_jit's gather path: re-derive selection/certification in
    numpy around the interpret-mode kernel and compare end-to-end."""
    import jax.numpy as jnp

    b, l, d, g, cap, m, k = 16, 2000, 48, 4, 4, 32, 6
    lp = -(-l // 128) * 128
    lib = rng.integers(0, 256, size=(l, d), dtype=np.uint8)
    blocks = lib[rng.integers(0, l, size=b)]
    lib_pad = np.zeros((lp, d), np.uint8)
    lib_pad[:l] = lib
    bf = jnp.asarray(blocks.reshape(-1))
    lf = jnp.asarray(lib_pad.reshape(-1))
    vals, cols, s_min = distance._ad_coarse_jit(
        bf, lf, d=d, g=g, chan=True, bc=8, cap=cap, real_l=l
    )
    d_g, r_g, ok_g = distance._ad_rescore_jit(
        bf, vals, cols, s_min, lf, d=d, bc=8, m=m, k=k, real_l=l,
        use_dma=False,
    )
    # numpy re-derivation with the DMA kernel for the distance stage
    v, c, sm = (np.asarray(x) for x in (vals, cols, s_min))
    order = np.lexsort((c, v), axis=-1)
    sv = np.take_along_axis(v, order, axis=1)
    sc = np.take_along_axis(c, order, axis=1)
    cand = sc[:, :m].astype(np.int32)
    c_next = np.minimum(sm, sv[:, m])
    mc = distance._rows_dma_mc(m, d)
    dist = np.asarray(
        distance._l1_rows_dma(
            jnp.asarray(blocks), jnp.asarray(cand), jnp.asarray(lib_pad),
            mc=mc, interpret=True,
        )
    )
    dist = np.where(cand < l, dist, distance.I32_MAX)
    order2 = np.lexsort((cand, dist), axis=-1)
    sd = np.take_along_axis(dist, order2, axis=1)[:, :k]
    so = np.take_along_axis(cand, order2, axis=1)[:, :k]
    ok = c_next > sd[:, k - 1]
    np.testing.assert_array_equal(np.asarray(d_g), sd)
    np.testing.assert_array_equal(np.asarray(r_g), so)
    np.testing.assert_array_equal(np.asarray(ok_g), ok)


def test_l1_rows_dma_bank_shape_validation(rng):
    """The banked DMA form's trace-time contracts: bank rows must be a
    power of two (the kernel derives the bank index by shift) and all
    banks equal-sized except a smaller last (SCALE_r03 M_dma_limit
    banking rules) — violations refuse loudly instead of mis-addressing."""
    import jax.numpy as jnp

    from emosaic_tpu.ops import distance

    b, d, m = 2, 128, 16
    blocks = jnp.zeros((b, d), jnp.uint8)
    cand = jnp.zeros((b, m), jnp.int32)
    mc = distance._rows_dma_mc(m, d)

    def mk(rows):
        return tuple(jnp.zeros((r, d), jnp.uint8) for r in rows)

    with pytest.raises(ValueError, match="power of two"):
        distance._l1_rows_dma(blocks, cand, mk([3, 3]), mc=mc, interpret=True)
    with pytest.raises(ValueError, match="equal-sized"):
        distance._l1_rows_dma(
            blocks, cand, mk([128, 64, 64]), mc=mc, interpret=True
        )
    with pytest.raises(ValueError, match="equal-sized"):
        distance._l1_rows_dma(
            blocks, cand, mk([128, 256]), mc=mc, interpret=True
        )


def test_l1_rescore_jit_dma_branch_bit_identical(rng):
    """Execute _l1_rescore_jit's use_dma=True dispatch (the hybrid
    scorer's TPU wiring, ops/distance.py:745) end to end via the Pallas
    interpreter and pin it bit-identical to the gather branch — including
    the padding-row masking and the sorted-candidate lowest-row
    tie-break. Before the `interpret` plumb this wiring only ever ran on
    silicon (tools/tpu_validate_distance.py DONE2)."""
    import jax.numpy as jnp

    b, bc, d, lp, real_l, k_pre, k = 8, 4, 128, 256, 250, 32, 8
    lib = rng.integers(0, 256, size=(lp, d), dtype=np.uint8)
    lib[real_l:] = 0  # padding rows — must be masked, not matched
    blocks = lib[rng.integers(0, real_l, size=b)]
    cand = rng.integers(0, lp, size=(b, k_pre)).astype(np.int32)
    cand[:, 0] = real_l  # a padding row in every candidate list
    cand[0, 1:3] = [7, 7]  # duplicate row: tie must resolve identically
    bf = jnp.asarray(blocks.reshape(-1))
    lf = jnp.asarray(lib.reshape(-1))
    cj = jnp.asarray(cand)
    assert distance._rows_dma_mc(k_pre, d) == k_pre  # branch condition
    d_dma, r_dma = distance._l1_rescore_jit(
        bf, cj, lf, d=d, bc=bc, k=k, real_l=real_l,
        use_dma=True, interpret=True,
    )
    d_g, r_g = distance._l1_rescore_jit(
        bf, cj, lf, d=d, bc=bc, k=k, real_l=real_l, use_dma=False,
    )
    np.testing.assert_array_equal(np.asarray(d_dma), np.asarray(d_g))
    np.testing.assert_array_equal(np.asarray(r_dma), np.asarray(r_g))
    assert (np.asarray(r_dma) < real_l).all()  # padding never selected


@pytest.mark.parametrize("banked", [False, True])
def test_ad_rescore_jit_dma_branch_bit_identical(monkeypatch, rng, banked):
    """Execute _ad_rescore_jit's use_dma=True dispatch (the adaptive
    scorer's TPU wiring, ops/distance.py:1742) through the interpreter
    and pin (dists, rows, ok) bit-identical to the gather branch, in both
    the single-buffer and the banked `_lib_banks` library forms."""
    import jax.numpy as jnp

    b, l, d, g, cap, m, k = 16, 2000, 128, 4, 4, 32, 6
    lp = -(-l // 128) * 128  # 2048
    lib = rng.integers(0, 256, size=(l, d), dtype=np.uint8)
    blocks = lib[rng.integers(0, l, size=b)]
    lib_pad = np.zeros((lp, d), np.uint8)
    lib_pad[:l] = lib
    bf = jnp.asarray(blocks.reshape(-1))
    if banked:
        monkeypatch.setattr(distance, "_DMA_LIB_BYTES_MAX", 300_000)
        lib_arg = distance._lib_banks(lib_pad, d)
        assert len(lib_arg) > 1
    else:
        lib_arg = jnp.asarray(lib_pad.reshape(-1))
    vals, cols, s_min = distance._ad_coarse_jit(
        bf, lib_arg, d=d, g=g, chan=False, bc=8, cap=cap, real_l=l
    )
    assert distance._rows_dma_mc(m, d) == m  # branch condition
    out_dma = distance._ad_rescore_jit(
        bf, vals, cols, s_min, lib_arg, d=d, bc=8, m=m, k=k, real_l=l,
        use_dma=True, interpret=True,
    )
    out_g = distance._ad_rescore_jit(
        bf, vals, cols, s_min, lib_arg, d=d, bc=8, m=m, k=k, real_l=l,
        use_dma=False,
    )
    for a, bb in zip(out_dma, out_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
