"""Render statistics (reference: src/mosaic/stats.rs).

Collects per-placement (position -> tile, distance) records, prints the
summary (stats.rs:87-139), and renders the grayscale match-quality heatmap
(stats.rs:154-195).

Coordinate-space quirk preserved: `render_nto1` records *source-pixel*
coords (rendering.rs:211-214) while the global-greedy no-repeat renderer
records *output-pixel* coords (rendering.rs:357-364); the heatmap and the
widget geometry only line up for the latter (SURVEY.md section 3.5).

Determinism improvement over the reference: top-10/worst-10 tie order is
HashMap-iteration-dependent there; here ties break by path / position.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np


@dataclass
class MosaicConfig:
    """Generation settings snapshot (stats.rs:10-21)."""

    tile_size: int
    mode: str
    no_repeat: bool
    greedy: bool
    crop: bool
    tint_opacity: float
    downsample: int
    randomize: float | None
    tiles_dir: str
    title: str


@dataclass
class StatsEntry:
    idx: int
    flipped: bool
    date_taken: str | None
    distance: int


@dataclass
class RenderStats:
    """Maps placement (x, y) -> (tile, distance) (stats.rs:28-31)."""

    tiles: dict[tuple[int, int], StatsEntry] = field(default_factory=dict)

    def push_tile(self, x: int, y: int, tile, distance: int) -> None:
        self.tiles[(x, y)] = StatsEntry(
            idx=tile.idx,
            flipped=tile.flipped,
            date_taken=tile.date_taken,
            distance=int(distance),
        )

    def tile_count(self) -> int:
        return len(self.tiles)

    def summarise(self, tile_set, log=lambda *a: print(*a, file=sys.stderr)) -> None:
        """Print totals, unique-image count, average distance, top-10 most
        used, worst-10 matches (stats.rs:87-139)."""
        if not self.tiles:
            log("No tiles recorded in statistics")
            return
        total = sum(e.distance for e in self.tiles.values())
        usage: dict[str, int] = {}
        for e in self.tiles.values():
            p = str(tile_set.get_path(e.idx))
            usage[p] = usage.get(p, 0) + 1
        log("Mosaic Statistics:")
        log(f"  Total tiles placed: {len(self.tiles)}")
        log(f"  Unique images used: {len(usage)}")
        log(f"  Average color distance: {total / len(self.tiles):.3f}")
        log("\nTop 10 most used tiles:")
        by_count = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (path, count) in enumerate(by_count[:10]):
            log(f"  {i + 1}. {path} ({count} times)")
        log("\nWorst 10 color matches:")
        worst = sorted(
            self.tiles.items(), key=lambda kv: (-kv[1].distance, kv[0])
        )
        for i, ((_x, _y), e) in enumerate(worst[:10]):
            log(f"  {i + 1}. {tile_set.get_path(e.idx)} (distance: {e.distance})")

    def render(self, tile_size: int) -> np.ndarray:
        """Grayscale heatmap, 1 px per placement, distance normalized to the
        max (stats.rs:154-195). Returns [h, w, 3] uint8."""
        if not self.tiles:
            raise ValueError("Cannot render visualization: no tiles recorded")
        if tile_size <= 0:
            raise ValueError("Tile size must be greater than 0")
        max_x = max(x for x, _ in self.tiles)
        max_y = max(y for _, y in self.tiles)
        max_d = max(e.distance for e in self.tiles.values())
        w = max_x // tile_size + 1
        h = max_y // tile_size + 1
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for (x, y), e in self.tiles.items():
            nd = e.distance / max_d if max_d > 0 else 0.0
            b = int(nd * 255.0)
            img[y // tile_size, x // tile_size] = b
        return img
