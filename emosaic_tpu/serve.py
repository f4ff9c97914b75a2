"""Long-lived mosaic service: `python -m emosaic_tpu.serve`.

The reference is a one-shot CLI (main.rs:346): every run re-reads the
analysis cache, rebuilds the tile stack, and — on an accelerator — pays
XLA compilation and library upload again. For production serving those
costs dominate small requests, so this module keeps a process resident
with the tile library analysed, the prepared-tile stack in memory, and
all jitted kernels warm; each request then costs only its own match +
composite + PNG encode.

HTTP surface (stdlib http.server, single-threaded — device work is
serialized anyway):

    GET  /healthz            -> JSON {status, tiles, mode, tile_size}
    POST /mosaic?{params}    -> image/png
         body: the source image bytes (any PIL-decodable format)
         params: no_repeat=0|1, greedy=0|1, randomize=FLOAT (percent),
                 seed=INT, tint=FLOAT (0..1), downsample=INT

Request semantics match the CLI exactly (same renderers, same quirks —
the tint path composites over the *pre-downsample* source like
main.rs:450). Errors return JSON with a 4xx/5xx status.
"""

from __future__ import annotations

import io
import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np
from PIL import Image

from emosaic_tpu.modes import Mode
from emosaic_tpu.ops.composite import tint_blend
from emosaic_tpu.render import render_nto1, render_nto1_no_repeat
from emosaic_tpu.tiles.builder import load_or_generate_tile_set


class MosaicService:
    """Resident pipeline state: tileset + stack loaded once, kernels
    warm after the first request per shape."""

    def __init__(
        self,
        tiles_dir: str | Path,
        mode: str = "1",
        tile_size: int = 16,
        *,
        crop: bool = False,
        extensions: set[str] | None = None,
        force: bool = False,
        max_stack_bytes: int = 8 << 30,
        log=lambda *a: print(*a, file=sys.stderr),
    ):
        from emosaic_tpu.cli import get_image_stack

        self.mode = Mode(mode)
        if self.mode is Mode.RANDOM:
            raise ValueError("serve supports matched modes (1..128), not random")
        self.dim = self.mode.dim
        self.tile_size = tile_size
        if tile_size % self.dim:
            raise ValueError(
                f"tile size {tile_size} not divisible by mode dim {self.dim}"
            )
        self.tiles_dir = Path(tiles_dir)
        self.log = log
        self.tile_set = load_or_generate_tile_set(
            self.tiles_dir,
            tile_size,
            extensions or {"jpg", "jpeg"},
            crop,
            self.dim,
            force=force,
            log=log,
        )
        if len(self.tile_set) == 0:
            raise ValueError(f"no usable tiles under {self.tiles_dir}")
        self.stack = get_image_stack(
            self.tile_set, self.tiles_dir, tile_size, max_bytes=max_stack_bytes
        )
        log(
            f"service ready: {len(self.tile_set)} tiles, mode {mode}, "
            f"tile size {tile_size}"
        )

    def render_bytes(
        self,
        source_bytes: bytes,
        *,
        no_repeat: bool = False,
        greedy: bool = False,
        randomize: float | None = None,
        seed: int = 0,
        tint: float = 0.0,
        downsample: int = 1,
    ) -> bytes:
        """Source image bytes -> mosaic PNG bytes (CLI semantics)."""
        from emosaic_tpu.cli import preprocess_source

        original = Image.open(io.BytesIO(source_bytes))
        src = preprocess_source(original, max(1, downsample), self.dim)
        if src.shape[0] < self.dim or src.shape[1] < self.dim:
            raise ValueError("source too small for this mode after rounding")
        if no_repeat and not greedy:
            out = render_nto1_no_repeat(
                src, self.tile_set, self.tile_size, stack=self.stack,
                log=self.log,
            )
        else:
            out = render_nto1(
                src, self.tile_set, self.tile_size,
                no_repeat=no_repeat,
                randomize=randomize,
                seed=seed,
                stack=self.stack,
                log=self.log,
            )
        image = out.image
        if tint > 0.0:
            original_rgb = np.asarray(original.convert("RGB"), dtype=np.uint8)
            image = tint_blend(image, original_rgb, tint)
        buf = io.BytesIO()
        Image.fromarray(np.asarray(image, dtype=np.uint8)).save(buf, "PNG")
        return buf.getvalue()


def _make_handler(service: MosaicService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to service log
            service.log(f"[serve] {fmt % args}")

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(
                    200,
                    {
                        "status": "ok",
                        "tiles": len(service.tile_set),
                        "mode": service.mode.value,
                        "tile_size": service.tile_size,
                    },
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/mosaic":
                self._json(404, {"error": "not found"})
                return
            q = {k: v[-1] for k, v in parse_qs(url.query).items()}
            try:
                n = int(self.headers.get("Content-Length") or 0)
                if n <= 0:
                    raise ValueError("empty request body (expected image bytes)")
                body = self.rfile.read(n)
                png = service.render_bytes(
                    body,
                    no_repeat=q.get("no_repeat", "0") == "1",
                    greedy=q.get("greedy", "0") == "1",
                    randomize=(
                        float(q["randomize"]) if "randomize" in q else None
                    ),
                    seed=int(q.get("seed", "0")),
                    tint=float(q.get("tint", "0")),
                    downsample=int(q.get("downsample", "1")),
                )
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — keep the service alive
                service.log(f"[serve] request failed: {type(e).__name__}: {e}")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, png, "image/png")

    return Handler


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="emosaic-tpu-serve",
        description="Resident mosaic service (library + kernels stay warm)",
    )
    p.add_argument("tiles_dir")
    p.add_argument("-m", "--mode", default="1")
    p.add_argument("-s", "--tile-size", type=int, default=16)
    p.add_argument("--crop", action="store_true")
    p.add_argument("--extensions", action="append", default=None)
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("--max-stack-bytes", type=int, default=8 << 30)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8040)
    args = p.parse_args(argv)

    service = MosaicService(
        args.tiles_dir,
        args.mode,
        args.tile_size,
        crop=args.crop,
        extensions=set(args.extensions) if args.extensions else None,
        force=args.force,
        max_stack_bytes=args.max_stack_bytes,
    )
    server = HTTPServer((args.host, args.port), _make_handler(service))
    print(
        f"serving on http://{args.host}:{server.server_address[1]}",
        file=sys.stderr,
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
