"""Native C++ engine parity vs the pure-Python fallbacks."""

import numpy as np
import pytest

from emosaic_tpu import native
from emosaic_tpu.io.prep import trim_bounds
from emosaic_tpu.render.greedy import (
    greedy_global_assign,
    greedy_sequence_assign,
    make_numpy_refill,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _candidates(rng, b, t, d, k):
    """Random blocks/lib + exact ascending top-k candidate lists."""
    blocks = rng.integers(0, 256, size=(b, d), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(t, d), dtype=np.uint8)
    lib = np.concatenate([pal, pal[:, ::-1]])  # fake flip rows
    dist = np.abs(
        blocks.astype(np.int32)[:, None, :] - lib.astype(np.int32)[None, :, :]
    ).sum(2, dtype=np.int32)
    order = np.argsort(dist + np.arange(2 * t)[None, :] * 0, axis=1, kind="stable")
    rows = order[:, :k].astype(np.int32)
    dists = np.take_along_axis(dist, rows, axis=1).astype(np.int32)
    return blocks, lib, dists, rows


def test_greedy_global_matches_python(rng):
    b, t, d, k = 60, 40, 3, 5  # small k forces refills
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_global_assign(cd, cr, 2 * t, t, refill)
    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t)
    assert (r_c == r_py).all()
    assert (d_c == d_py).all()


def test_greedy_sequence_matches_python(rng):
    b, t, d, k = 50, 30, 12, 4
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    order = rng.permutation(b).astype(np.int32)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_sequence_assign(order, cd, cr, 2 * t, refill)
    r_c, d_c = native.greedy_sequence(order, cd, cr, blocks, lib)
    assert (r_c == r_py).all()
    assert (d_c == d_py).all()


def test_greedy_global_library_exhaustion(rng):
    # more blocks than tiles (mirror exclusion): some blocks stay -1 in both
    b, t, d, k = 20, 8, 3, 16
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_global_assign(cd, cr, 2 * t, t, refill)
    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t)
    assert (r_c == r_py).all()
    assert (r_c < 0).sum() == b - t  # t placements consume both orientations


def test_trim_bounds_matches_python(rng):
    img = np.full((30, 44, 3), 255, dtype=np.uint8)
    img[5:25, 8:40] = rng.integers(0, 200, size=(20, 32, 3), dtype=np.uint8)
    img[7, :] = 255  # a white stripe inside
    assert native.trim_bounds(img) == trim_bounds(img)
    allwhite = np.full((8, 8, 3), 255, dtype=np.uint8)
    with pytest.raises(ValueError):
        native.trim_bounds(allwhite)


@pytest.mark.parametrize("d", [96, 37])  # SIMD main loop only / odd tail
def test_greedy_global_clustered_contention(rng, d):
    """Heavy cluster contention drives the refill path hard (SIMD L1 +
    coarse sum-bound with strict tie handling); native must stay
    bit-identical to the Python engine, including with duplicated rows."""
    t, b, k = 120, 200, 6
    centers = rng.integers(0, 256, size=(5, d))
    pal = np.clip(
        centers[rng.integers(0, 5, t)] + rng.normal(0, 6, (t, d)), 0, 255
    ).astype(np.uint8)
    pal[50] = pal[10]  # exact duplicates -> (dist, row) ties in refills
    pal[90] = pal[10]
    lib = np.concatenate([pal, pal[:, ::-1]])
    blocks = np.clip(
        pal[rng.integers(0, t, b)] + rng.normal(0, 4, (b, d)), 0, 255
    ).astype(np.uint8)
    dist = np.abs(
        blocks.astype(np.int32)[:, None, :] - lib.astype(np.int32)[None, :, :]
    ).sum(2, dtype=np.int32)
    order = np.argsort(dist, axis=1, kind="stable")
    cr = order[:, :k].astype(np.int32)
    cd = np.take_along_axis(dist, cr, axis=1).astype(np.int32)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_global_assign(cd, cr, 2 * t, t, refill)
    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t)
    assert (r_c == r_py).all()
    assert (d_c == d_py).all()
    assigned = r_c[r_c >= 0]
    assert len(np.unique(assigned)) == len(assigned)  # no repeats


def _clustered(rng, t, b, d, k, dup=True):
    centers = rng.integers(0, 256, size=(5, d))
    pal = np.clip(
        centers[rng.integers(0, 5, t)] + rng.normal(0, 6, (t, d)), 0, 255
    ).astype(np.uint8)
    if dup:
        pal[min(50, t - 1)] = pal[10 % t]  # (dist, row) ties in refills
    lib = np.concatenate([pal, pal[:, ::-1]])
    blocks = np.clip(
        pal[rng.integers(0, t, b)] + rng.normal(0, 4, (b, d)), 0, 255
    ).astype(np.uint8)
    dist = np.abs(
        blocks.astype(np.int32)[:, None, :] - lib.astype(np.int32)[None, :, :]
    ).sum(2, dtype=np.int32)
    order = np.argsort(dist, axis=1, kind="stable")
    cr = order[:, :k].astype(np.int32)
    cd = np.take_along_axis(dist, cr, axis=1).astype(np.int32)
    return blocks, lib, cd, cr


def test_device_refiller_matches_numpy_refill(rng):
    """The masked device top-k (compacted stripes) must reproduce the host
    refill exactly — ascending (dist, row), lowest-row ties — for masks in
    both the bulk and tail regimes, including duplicate-row ties."""
    from emosaic_tpu.ops.distance import DeviceRefiller

    t, b, d, k = 70, 24, 48, 16
    blocks, lib, _, _ = _clustered(rng, t, b, d, k)
    refill = make_numpy_refill(blocks, lib, k=k)
    dev = DeviceRefiller(blocks, lib, k=k, defer_events=0)
    I32_MAX = np.int32(2**31 - 1)
    for frac in (0.0, 0.5, 0.95, 1.0):
        used = (rng.random(2 * t) < frac).astype(np.uint8)
        ids = rng.choice(b, size=7, replace=False).astype(np.int64)
        dd, dr = dev(ids, used)
        nd_, nr_ = refill(ids, used.astype(bool))
        for i in range(len(ids)):
            valid = nd_[i] != I32_MAX
            assert (dd[i][: valid.sum()] == nd_[i][valid]).all()
            assert (dr[i][: valid.sum()] == nr_[i][valid]).all()
            assert (dd[i][valid.sum() :] == I32_MAX).all()


@pytest.mark.parametrize("margin", [0, 64])
def test_greedy_global_device_refill_bit_identical(rng, margin):
    """The batched device-refill engine must produce the exact assignment
    of the host-scan engine — including with aggressive pre-refill
    batching (margin=64 pre-refills nearly every live block per event)."""
    from emosaic_tpu.ops.distance import DeviceRefiller

    t, b, d, k = 120, 200, 96, 6  # b approaches the 2T admission bound
    blocks, lib, cd, cr = _clustered(rng, t, b, d, k)
    base_r, base_d = native.greedy_global(cd, cr, blocks, lib, t)
    dev = DeviceRefiller(blocks, lib, defer_events=0)
    r_c, d_c = native.greedy_global(
        cd, cr, blocks, lib, t,
        refill_cb=dev, cb_margin=margin, cb_max_batch=dev.max_batch,
    )
    assert dev.n_calls > 0  # the device path actually ran
    assert (r_c == base_r).all()
    assert (d_c == base_d).all()


def test_greedy_global_refill_cb_failure_falls_back(rng):
    """A raising callback must degrade to the host masked scan with
    identical output."""
    t, b, d, k = 60, 100, 24, 4
    blocks, lib, cd, cr = _clustered(rng, t, b, d, k)
    base_r, base_d = native.greedy_global(cd, cr, blocks, lib, t)
    calls = []

    def broken(ids, used):
        calls.append(len(ids))
        raise RuntimeError("device unavailable")

    r_c, d_c = native.greedy_global(
        cd, cr, blocks, lib, t, refill_cb=broken
    )
    assert calls  # the callback was attempted
    assert (r_c == base_r).all()
    assert (d_c == base_d).all()


def test_device_refiller_defers_then_engages(rng):
    """A cold refiller routes its first `defer_events` events to the host
    scan (no upload), then serves from the device; warm() skips deferral.
    Assignments stay bit-identical through both regimes."""
    from emosaic_tpu.ops.distance import DeviceRefiller, _DeferRefill

    t, b, d, k = 120, 200, 96, 6
    blocks, lib, cd, cr = _clustered(rng, t, b, d, k)
    base_r, base_d = native.greedy_global(cd, cr, blocks, lib, t)

    dev = DeviceRefiller(blocks, lib, defer_events=3)
    r_c, d_c = native.greedy_global(
        cd, cr, blocks, lib, t, refill_cb=dev, cb_max_batch=dev.max_batch
    )
    assert dev.n_deferred == 3  # absorbed exactly the configured events
    assert dev.n_calls > 0  # then engaged the device path
    assert (r_c == base_r).all() and (d_c == base_d).all()

    # direct call while cold raises the defer signal (the C++ trampoline
    # maps it to the host-fallback return code)
    cold = DeviceRefiller(blocks, lib, defer_events=1)
    with pytest.raises(_DeferRefill):
        cold(np.arange(3, dtype=np.int64), np.zeros(2 * t, np.uint8))
    cold.warm()  # explicit warm bypasses any remaining deferral
    dd, _ = cold(np.arange(3, dtype=np.int64), np.zeros(2 * t, np.uint8))
    assert (dd[:, 0] < 2**31 - 1).all()


def test_greedy_global_exhaustion_short_circuit(rng):
    """With more blocks than assignable tiles, post-exhaustion refills
    must be skipped (n_unused counter) and never reach the callback —
    while assignments stay identical to the Python engine."""
    t, b, d, k = 30, 90, 24, 3  # b > t: library fully consumed
    blocks, lib, cd, cr = _clustered(rng, t, b, d, k)

    calls = []

    def spy(ids, used):
        calls.append(np.flatnonzero(used == 0).size)
        raise RuntimeError("should never be called with an empty mask")

    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t, refill_cb=spy)
    assert int((r_c >= 0).sum()) == t  # full library consumption
    for n_unused in calls:
        assert n_unused > 0  # exhausted-library events were short-circuited

    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_global_assign(cd, cr, 2 * t, t, refill)
    assert (r_c == r_py).all() and (d_c == d_py).all()


def test_cb_k_derived_from_refiller(rng):
    """greedy_global must take its candidate width from the refiller's k
    when cb_k isn't given — a silent mismatch would shape-error every
    refill event into the host-scan fallback."""
    from emosaic_tpu.ops.distance import DeviceRefiller

    t, b, d, k = 40, 70, 12, 4
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    base_r, base_d = native.greedy_global(cd, cr, blocks, lib, t)
    dev = DeviceRefiller(blocks, lib, k=16, defer_events=0)  # non-default k
    r_c, d_c = native.greedy_global(
        cd, cr, blocks, lib, t, refill_cb=dev, cb_max_batch=dev.max_batch
    )
    assert dev.n_calls > 0
    assert (r_c == base_r).all() and (d_c == base_d).all()


def test_stale_so_forces_one_rebuild(tmp_path, monkeypatch):
    """A pre-existing .so from an older source tree (missing newly added
    symbols) must trigger one forced rebuild, not raise AttributeError out
    of available()/load()."""
    import subprocess
    from emosaic_tpu import native as nat

    real = nat._NATIVE_DIR / nat._LIB_NAME
    stale_src = tmp_path / "stale.cpp"
    stale_src.write_text('extern "C" int emosaic_unrelated() { return 0; }\n')
    so = tmp_path / nat._LIB_NAME
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so), str(stale_src)], check=True
    )
    # `make` sees the target up to date; only the forced `-B` rebuild fixes it
    (tmp_path / "Makefile").write_text(
        f"{nat._LIB_NAME}:\n\tcp {real} $@\n"
    )
    monkeypatch.setattr(nat, "_NATIVE_DIR", tmp_path)
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_load_attempted", False)
    lib = nat.load()
    assert lib is not None
    assert hasattr(lib, "emosaic_greedy_global_cb")


def test_unbuildable_stale_so_returns_none(tmp_path, monkeypatch):
    """If the stale .so can't be rebuilt, load() degrades to None (Python
    fallbacks) instead of raising."""
    import subprocess
    from emosaic_tpu import native as nat

    stale_src = tmp_path / "stale.cpp"
    stale_src.write_text('extern "C" int emosaic_unrelated() { return 0; }\n')
    so = tmp_path / nat._LIB_NAME
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so), str(stale_src)], check=True
    )
    (tmp_path / "Makefile").write_text("all:\n\tfalse\n")
    monkeypatch.setattr(nat, "_NATIVE_DIR", tmp_path)
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_load_attempted", False)
    assert nat.load() is None
    assert nat.available() is False


def test_refill_deferral_silent_but_real_failures_log_once(rng, capfd):
    """Deliberate _DeferRefill deferrals are silent control flow; any
    other callback exception is logged once (not per event) so a
    misconfigured callback can't silently degrade to host scans."""
    from emosaic_tpu.ops.distance import DeviceRefiller

    t, b, d, k = 30, 60, 12, 3
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    dev = DeviceRefiller(blocks, lib, defer_events=10**9)  # always defers
    native.greedy_global(cd, cr, blocks, lib, t, refill_cb=dev)
    assert "refill callback failed" not in capfd.readouterr().err

    calls = []

    def broken(ids, used):
        calls.append(1)
        raise RuntimeError("boom")

    base_r, base_d = native.greedy_global(cd, cr, blocks, lib, t)
    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t, refill_cb=broken)
    err = capfd.readouterr().err
    assert len(calls) > 1  # it really failed on multiple events
    assert err.count("refill callback failed") == 1
    assert (r_c == base_r).all() and (d_c == base_d).all()


def test_device_refiller_oversized_library_stays_on_host(rng, monkeypatch):
    """Past the device-resident budget the refiller must never upload:
    warm() is a no-op and every event raises the defer signal (the C++
    engine's exact host scan serves it) — assignments identical."""
    from emosaic_tpu.ops import distance
    from emosaic_tpu.ops.distance import DeviceRefiller, _DeferRefill

    t, b, d, k = 120, 200, 96, 6
    blocks, lib, cd, cr = _clustered(rng, t, b, d, k)
    base_r, base_d = native.greedy_global(cd, cr, blocks, lib, t)

    monkeypatch.setattr(distance, "_DEVICE_LIB_BYTES_MAX", lib.nbytes - 1)
    dev = DeviceRefiller(blocks, lib, defer_events=0)
    dev.warm()
    assert dev._blocks_dev is None  # warm refused the upload
    with pytest.raises(_DeferRefill):
        dev(np.arange(3, dtype=np.int64), np.zeros(2 * t, np.uint8))
    r_c, d_c = native.greedy_global(
        cd, cr, blocks, lib, t, refill_cb=dev, cb_max_batch=dev.max_batch
    )
    assert dev.n_calls == 0  # no event ever reached the device path
    assert (r_c == base_r).all() and (d_c == base_d).all()


def test_trim_bounds_rejects_non_rgb(rng):
    """The C++ scan indexes (y*w+x)*3+2 unconditionally; non-[h,w,3]
    arrays must be rejected in the wrapper, not read out of bounds
    (review r4)."""
    gray = rng.integers(0, 200, size=(8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match=r"\[h, w, 3\]"):
        native.trim_bounds(gray)
    rgba = rng.integers(0, 200, size=(8, 8, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match=r"\[h, w, 3\]"):
        native.trim_bounds(rgba)
