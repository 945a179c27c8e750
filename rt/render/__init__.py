from rt.render.renderer import ProgressiveRenderer, RenderState, render_frame  # noqa: F401
from rt.render.ppm import render_ppm, compare_ppm, write_ppm, parse_ppm  # noqa: F401
