"""Renderers: matched (repeat / randomize / greedy no-repeat), global-greedy
no-repeat, and random mode."""

from emosaic_tpu.render.matched import RenderOutcome, render_nto1  # noqa: F401
from emosaic_tpu.render.norepeat import render_nto1_no_repeat  # noqa: F401
from emosaic_tpu.render.random_mode import render_random  # noqa: F401
