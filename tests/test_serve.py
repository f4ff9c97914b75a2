"""Resident mosaic service: HTTP round trips match the direct renderers."""

import io
import json
from pathlib import Path
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from emosaic_tpu.serve import MosaicService, _make_handler


@pytest.fixture
def scene(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(10):
        base = rng.integers(0, 256, size=3)
        arr = np.clip(base + rng.normal(0, 25, (24, 24, 3)), 0, 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=92)
    src = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, "PNG")
    return tiles, buf.getvalue(), src


def _quiet(*a):
    pass


def test_service_matches_cli_renderer(scene):
    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    png = svc.render_bytes(src_bytes)
    got = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))

    from emosaic_tpu.render import render_nto1

    ref = render_nto1(src, svc.tile_set, 8, stack=svc.stack, log=_quiet)
    assert (got == np.asarray(ref.image)).all()


def test_service_rejects_random_mode(scene):
    tiles, _, _ = scene
    with pytest.raises(ValueError, match="random"):
        MosaicService(tiles, "random", 8, log=_quiet)


@pytest.fixture
def server(scene):
    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(svc))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, svc, src_bytes, src
    httpd.shutdown()


def test_healthz(server):
    base, svc, _, _ = server
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info == {
        "status": "ok",
        "tiles": len(svc.tile_set),
        "mode": "1",
        "tile_size": 8,
    }


def test_http_mosaic_round_trip(server):
    base, svc, src_bytes, src = server
    req = urllib.request.Request(
        f"{base}/mosaic?tint=0.5", data=src_bytes, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/png"
        got = np.asarray(Image.open(io.BytesIO(r.read())).convert("RGB"))
    ref = np.asarray(
        Image.open(io.BytesIO(svc.render_bytes(src_bytes, tint=0.5))).convert(
            "RGB"
        )
    )
    assert (got == ref).all()
    assert got.shape == (9 * 8, 12 * 8, 3)


def test_http_no_repeat_and_errors(server):
    base, svc, src_bytes, _ = server
    # no-repeat needs blocks <= 2*tiles: 9x12 blocks=108 > 20 -> 400
    # (ValueError -> client error) with the insufficient-tiles message,
    # and the service stays alive
    req = urllib.request.Request(
        f"{base}/mosaic?no_repeat=1", data=src_bytes, method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=120)
    assert e.value.code == 400
    assert "Insufficient tiles" in json.loads(e.value.read())["error"]

    # empty body -> 400
    req = urllib.request.Request(f"{base}/mosaic", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400

    # unknown path -> 404; service still healthy afterwards
    req = urllib.request.Request(f"{base}/nope", data=b"x", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_http_randomize_seed_deterministic(server):
    base, svc, src_bytes, _ = server

    def fetch(seed):
        req = urllib.request.Request(
            f"{base}/mosaic?randomize=50&seed={seed}",
            data=src_bytes,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return np.asarray(Image.open(io.BytesIO(r.read())).convert("RGB"))

    a, b, c = fetch(7), fetch(7), fetch(8)
    assert (a == b).all()  # same seed -> identical
    assert a.shape == c.shape


def test_http_413_request_cap(scene):
    tiles, src_bytes, _ = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(svc, max_request_bytes=100)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base}/mosaic", data=src_bytes, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 413
        assert "exceeds" in json.loads(e.value.read())["error"]
    finally:
        httpd.shutdown()


def test_http_chunked_stream_matches_buffered(scene):
    """A tiny stream_threshold forces the chunked band-streamed PNG path;
    pixels must equal the buffered response."""
    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(svc, stream_threshold=1)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base}/mosaic?tint=0.5", data=src_bytes, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert r.headers.get("Content-Length") is None
            got = np.asarray(Image.open(io.BytesIO(r.read())).convert("RGB"))
    finally:
        httpd.shutdown()
    ref = np.asarray(
        Image.open(io.BytesIO(svc.render_bytes(src_bytes, tint=0.5))).convert(
            "RGB"
        )
    )
    assert (got == ref).all()


def test_warmup_smoke(scene):
    tiles, src_bytes, _ = scene
    msgs = []
    svc = MosaicService(tiles, "1", 8, log=lambda *a: msgs.append(a))
    svc.warmup(24, 16)
    assert any("warmup 24x16" in str(m) for m in msgs)
    # warmed service still renders normally
    png = svc.render_bytes(src_bytes)
    assert png[:4] == b"\x89PNG"


def test_streaming_png_writer_filelike_sink(rng):
    """StreamingPNGWriter must accept a file-like sink and not close it."""
    from emosaic_tpu.io.codecs import StreamingPNGWriter

    img = rng.integers(0, 256, size=(12, 7, 3), dtype=np.uint8)
    buf = io.BytesIO()
    with StreamingPNGWriter(buf, 7, 12) as w:
        w.write_band(img[:5])
        w.write_band(img[5:])
    assert not buf.closed
    got = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert (got == img).all()


def test_http11_keepalive_not_poisoned_by_unread_body(server):
    """A POST to a wrong path answers 404 without reading the body; under
    HTTP/1.1 keep-alive the server must close the connection, otherwise
    the unread body bytes get parsed as the next request line."""
    import socket

    base, svc, src_bytes, _ = server
    host, port = base.replace("http://", "").split(":")
    with socket.create_connection((host, int(port)), timeout=30) as s:
        req = (
            f"POST /wrongpath HTTP/1.1\r\nHost: {host}\r\n"
            f"Content-Length: {len(src_bytes)}\r\n\r\n"
        ).encode() + src_bytes
        s.sendall(req)
        s.settimeout(30)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
        assert b"404" in data.split(b"\r\n", 1)[0]
        # the server must signal close (header or EOF), not keep-alive
        header = data.lower()
        if b"connection: close" not in header:
            # drain until EOF; a poisoned connection would instead try to
            # parse the body as a request and answer 400/501 garbage
            s.settimeout(5)
            rest = b""
            try:
                while True:
                    chunk = s.recv(65536)
                    if not chunk:
                        break
                    rest += chunk
            except TimeoutError:
                pass
            assert b"HTTP/1.1 4" not in rest and b"HTTP/1.1 5" not in rest
    # and the service still works on a fresh connection
    req2 = urllib.request.Request(
        f"{base}/mosaic", data=src_bytes, method="POST"
    )
    with urllib.request.urlopen(req2, timeout=120) as r:
        assert r.status == 200


def test_http_chunked_stream_no_repeat(scene):
    """Streamed responses must also cover the no-repeat renderer
    (compose=False + banded composite under the chunked writer)."""
    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(svc, stream_threshold=1)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        # downsample so blocks fit the 2*tiles no-repeat bound
        req = urllib.request.Request(
            f"{base}/mosaic?no_repeat=1&downsample=3",
            data=src_bytes,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            got = np.asarray(Image.open(io.BytesIO(r.read())).convert("RGB"))
    finally:
        httpd.shutdown()
    ref = np.asarray(
        Image.open(
            io.BytesIO(svc.render_bytes(src_bytes, no_repeat=True, downsample=3))
        ).convert("RGB")
    )
    assert (got == ref).all()


def test_healthz_responsive_during_inflight_render(server, monkeypatch):
    """ThreadingHTTPServer + render lock: while one render is blocked
    in flight, /healthz must still answer (and the render completes
    correctly afterwards)."""
    base, svc, src_bytes, _ = server
    entered = threading.Event()
    release = threading.Event()
    real_plan = svc.render_plan

    def slow_plan(*a, **k):
        entered.set()
        assert release.wait(30), "test deadlock: release never set"
        return real_plan(*a, **k)

    monkeypatch.setattr(svc, "render_plan", slow_plan)

    result = {}

    def post():
        req = urllib.request.Request(
            f"{base}/mosaic", data=src_bytes, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            result["png"] = r.read()

    t = threading.Thread(target=post, daemon=True)
    t.start()
    assert entered.wait(30)  # the render is now in flight, holding the lock
    with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"
    release.set()
    t.join(timeout=120)
    assert not t.is_alive()
    monkeypatch.setattr(svc, "render_plan", real_plan)
    expected = svc.render_bytes(src_bytes)
    assert result["png"] == expected


def test_http_503_when_pending_bound_exceeded(scene, monkeypatch):
    """max_pending bounds how many request bodies sit in RAM at once:
    with one render blocked in flight, a second concurrent POST must get
    503 (body unread) instead of buffering without bound."""
    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(svc, max_pending=1)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    entered = threading.Event()
    release = threading.Event()
    real_plan = svc.render_plan

    def slow_plan(*a, **k):
        entered.set()
        assert release.wait(30), "test deadlock: release never set"
        return real_plan(*a, **k)

    monkeypatch.setattr(svc, "render_plan", slow_plan)
    result = {}

    def post():
        req = urllib.request.Request(
            f"{base}/mosaic", data=src_bytes, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            result["png"] = r.read()

    th = threading.Thread(target=post, daemon=True)
    th.start()
    assert entered.wait(30)  # render in flight, pending slot held
    req2 = urllib.request.Request(
        f"{base}/mosaic", data=src_bytes, method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req2, timeout=10)
    assert exc.value.code == 503
    release.set()
    th.join(timeout=120)
    assert not th.is_alive()
    assert result["png"] == svc.render_bytes(src_bytes)  # slot released,
    httpd.shutdown()                                     # service healthy


def test_slow_loris_body_times_out_and_frees_the_server(scene):
    """ADVICE r3 (medium): a client that sends headers but trickles (or
    never sends) the body must be disconnected by the handler io_timeout
    instead of holding a pending slot / the render path forever. With
    max_pending=1 the stalled client would previously wedge the whole
    server."""
    import socket

    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        _make_handler(svc, max_pending=1, io_timeout=1.0),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"

    # slow-loris: headers promise a body that never arrives
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    s.sendall(
        b"POST /mosaic HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: 1000\r\n\r\n"
    )
    # the server must drop the connection after ~io_timeout
    s.settimeout(30)
    assert s.recv(4096) == b""  # EOF: handler timed out and closed
    s.close()

    # ... and a well-behaved request must now succeed (slot released)
    req = urllib.request.Request(
        f"{base}/mosaic", data=src_bytes, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        png = r.read()
    assert png == svc.render_bytes(src_bytes)
    httpd.shutdown()


# ---------------------------------------------------------------------------
# stream spool: the device is never paced by a client's read speed
# ---------------------------------------------------------------------------


def test_spool_bounds_and_stall():
    """_Spool unit semantics: FIFO integrity, budget backpressure, stall
    abort, and consumer-cancel unblocking the producer."""
    import time

    from emosaic_tpu.serve import _Spool

    # FIFO + drain/close
    sp = _Spool(budget=1 << 20, stall_secs=0)
    sp.write(b"ab")
    sp.write(b"cd")
    sp.close()
    assert sp.get() == b"ab" and sp.get() == b"cd" and sp.get() is None

    # budget backpressure: a second write blocks until the consumer drains
    sp = _Spool(budget=2, stall_secs=0)
    sp.write(b"xx")  # fills the budget
    done = threading.Event()

    def blocked_writer():
        sp.write(b"yy")
        done.set()

    t = threading.Thread(target=blocked_writer, daemon=True)
    t.start()
    time.sleep(0.1)
    assert not done.is_set()  # writer is waiting for room
    assert sp.get() == b"xx"
    assert done.wait(5)
    sp.close()
    assert sp.get() == b"yy" and sp.get() is None

    # stall policy: a full spool + no consumer raises in the producer
    sp = _Spool(budget=1, stall_secs=0.2)
    sp.write(b"z")
    with pytest.raises(TimeoutError):
        sp.write(b"z")

    # cancel: a blocked producer aborts immediately
    sp = _Spool(budget=1, stall_secs=0)
    sp.write(b"z")
    err = {}

    def cancelled_writer():
        try:
            sp.write(b"z")
        except BrokenPipeError as e:
            err["e"] = e

    t = threading.Thread(target=cancelled_writer, daemon=True)
    t.start()
    time.sleep(0.1)
    sp.cancel()
    t.join(timeout=5)
    assert not t.is_alive() and "e" in err
    # ... and further writes raise without blocking
    with pytest.raises(BrokenPipeError):
        sp.write(b"w")


def test_stream_slow_client_does_not_block_next_render(scene):
    """The round-3 design held the render lock across the whole chunked
    socket drain, so one slow reader serialized every other render. With
    the spool, the producer finishes at device speed and a concurrent
    request completes while the slow client is still mid-drain."""
    import socket

    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        _make_handler(svc, stream_threshold=1),  # every render streams
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        # client A: POST, then read only the status line and stop draining
        a = socket.create_connection(("127.0.0.1", port), timeout=60)
        a.sendall(
            b"POST /mosaic HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: %d\r\n\r\n" % len(src_bytes)
        )
        a.sendall(src_bytes)
        first = a.recv(64)  # headers started: the render is in flight
        assert first.startswith(b"HTTP/1.1 200")

        # client B must complete while A is parked mid-response
        req = urllib.request.Request(
            f"{base}/mosaic", data=src_bytes, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            png_b = r.read()
        ref = np.asarray(
            Image.open(io.BytesIO(svc.render_bytes(src_bytes))).convert("RGB")
        )
        got_b = np.asarray(Image.open(io.BytesIO(png_b)).convert("RGB"))
        assert (got_b == ref).all()  # B completed while A was parked

        # A now drains fully and gets the identical complete PNG
        a.settimeout(60)
        data = first
        while b"0\r\n\r\n" not in data[-8:]:
            got = a.recv(65536)
            if not got:
                break
            data += got
        a.close()
        head, _, rest = data.partition(b"\r\n\r\n")
        assert b"Transfer-Encoding: chunked" in head
        # de-chunk
        body = b""
        while rest:
            size, _, rest = rest.partition(b"\r\n")
            n = int(size, 16)
            if n == 0:
                break
            body += rest[:n]
            rest = rest[n + 2:]
        ref = np.asarray(
            Image.open(io.BytesIO(svc.render_bytes(src_bytes))).convert("RGB")
        )
        got_img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
        assert (got_img == ref).all()
    finally:
        httpd.shutdown()


def test_stream_stalled_client_aborts_render_and_frees_device(scene, rng):
    """A client that stops reading must not hold the device: with the
    spool full, the producer aborts after --spool-stall-secs (and the
    blocked socket write dies at io_timeout), then the next request
    renders normally. Needs an output big enough that the kernel socket
    buffers cannot absorb it (a big random source: the streamed PNG is
    ~28 MB at compress level 1)."""
    import socket
    import time

    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    big = rng.integers(0, 256, size=(384, 384, 3), dtype=np.uint8)
    big_buf = io.BytesIO()
    Image.fromarray(big).save(big_buf, "PNG")
    big_bytes = big_buf.getvalue()
    # warm every jit/LUT for this shape so the timed section below is
    # pure pipeline (first-compile cost would outlast the client's park)
    svc.render_bytes(big_bytes)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        _make_handler(
            svc,
            stream_threshold=1,
            spool_bytes=4096,  # tiny: fills as soon as the socket blocks
            spool_stall_secs=0.5,
            io_timeout=3.0,
        ),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        # small receive window so the server-side write blocks early
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        s.settimeout(60)
        s.connect(("127.0.0.1", port))
        s.sendall(
            b"POST /mosaic HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: %d\r\n\r\n" % len(big_bytes)
        )
        s.sendall(big_bytes)
        # park without reading: socket buffers fill -> handler write
        # blocks -> spool fills -> producer times out (0.5 s) -> handler
        # write dies at io_timeout (3 s) -> connection closed
        time.sleep(8.0)
        s.settimeout(30)
        data = b""
        while True:
            try:
                got = s.recv(65536)
            except TimeoutError:
                raise AssertionError("server kept the stalled stream open")
            if not got:
                break
            data += got
        s.close()
        assert not data.endswith(b"0\r\n\r\n")  # truncated, not completed

        # the device is free: a well-behaved request succeeds
        req = urllib.request.Request(
            f"{base}/mosaic", data=src_bytes, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            png = r.read()
        ref = np.asarray(
            Image.open(io.BytesIO(svc.render_bytes(src_bytes))).convert("RGB")
        )
        got = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        assert (got == ref).all()
    finally:
        httpd.shutdown()


def test_serve_main_entry_subprocess(scene):
    """The real `python -m emosaic_tpu.serve` entry (argparse -> service
    -> warmup -> ThreadingHTTPServer): start it on an ephemeral port,
    hit /healthz and /mosaic, and check the PNG — the only place the
    production arg surface and the 'serving on' banner are executed."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time as _time
    import urllib.request

    tiles, src_bytes, src = scene
    repo = Path(__file__).parent.parent
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from emosaic_tpu.serve import main\n"
        f"raise SystemExit(main(['{tiles}', '-m', '1', '-s', '8',"
        " '--port', '0', '--warmup', '16x16']))\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        env=env,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        port = None
        deadline = _time.time() + 180
        for line in proc.stderr:
            m = re.search(r"serving on http://127\.0\.0\.1:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
            assert _time.time() < deadline, "server never came up"
        assert port, "no serving banner"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["tiles"] == 10
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mosaic?seed=0",
            data=src_bytes,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            png = r.read()
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        assert img.shape == (8 * (src.shape[0] // 1), 8 * 12, 3)
    finally:
        proc.send_signal(signal.SIGINT)  # KeyboardInterrupt -> clean exit
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_decoded_pixel_cap_413(scene):
    """--max-source-pixels: the body byte cap cannot bound a
    decompression bomb; an over-pixel source must get 413 after a
    header-only parse, never a full decode (review r4)."""
    from http.server import ThreadingHTTPServer

    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(svc, max_source_pixels=50)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mosaic", data=src_bytes, method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 413")
        except urllib.error.HTTPError as e:
            assert e.code == 413
            body = json.loads(e.read())
            assert "decode limit" in body["error"]
        # garbage body -> 400 from the header parse, not a 500
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mosaic", data=b"not an image",
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_render_bytes_buffers_streamed_plan(scene):
    """render_bytes must PNG-encode the banded stream into a buffer when
    the plan streams (tiny --max-stack-bytes forces the host path)."""
    tiles, src_bytes, src = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet, max_stack_bytes=1)
    assert svc.stack is None  # too big by construction -> streamed plans
    png = svc.render_bytes(src_bytes)
    img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    assert img.shape == (src.shape[0] * 8, src.shape[1] * 8, 3)


def test_malformed_content_length_400(scene):
    """A garbage Content-Length header must get a clean 400 + close, not
    an exception in the handler thread."""
    import socket as _socket
    from http.server import ThreadingHTTPServer

    tiles, src_bytes, _ = scene
    svc = MosaicService(tiles, "1", 8, log=_quiet)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(svc))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with _socket.create_connection(
            ("127.0.0.1", httpd.server_address[1]), timeout=30
        ) as s:
            s.sendall(
                b"POST /mosaic HTTP/1.1\r\nHost: x\r\n"
                b"Content-Length: abc\r\n\r\n"
            )
            chunks = b""
            while b"invalid Content-Length" not in chunks:
                got = s.recv(4096)
                if not got:
                    break
                chunks += got
            resp = chunks.decode()
        assert " 400 " in resp.splitlines()[0]
        assert "invalid Content-Length" in resp
    finally:
        httpd.shutdown()


def test_http_unknown_path_404(server):
    base, _, _, _ = server
    req = urllib.request.Request(f"{base}/nope", method="GET")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("unknown path accepted")
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert json.loads(e.read())["error"] == "not found"


def test_service_rejects_indivisible_tile_size(scene):
    """mode dim must divide tile size — a loud init error, matching the
    CLI's validation (the reference panics later, in analysis)."""
    tiles, _, _ = scene
    with pytest.raises(ValueError, match="not divisible"):
        MosaicService(tiles, "16", 10, log=_quiet)  # dim 4, 10 % 4 != 0
