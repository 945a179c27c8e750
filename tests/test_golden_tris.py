"""Triangle-scene regression goldens.

The reference has NO golden tests for its mesh scenes (SURVEY.md §4 —
triangle coverage is smoke renders only).  These goldens close that gap:
generated once from this repo's oracle (which is bit-exact vs the
reference's sphere goldens, so the shared machinery — RNG, camera, scatter,
accumulation — is anchored), 128×128, 8 frames at times 1000..1070.

The comparison bound is 0.05% (40× tighter than the reference's 2%
acceptance): renders must stay essentially bit-stable; any intentional
change to traversal/intersection semantics must regenerate these via
``python tests/test_golden_tris.py``.
"""

import os

import pytest

from rt.render import ProgressiveRenderer, compare_ppm, render_ppm
from rt.scene import scenes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_tris")
# name -> (builder, size, frames); the large meshes render at 96x96 x 2
# frames (the oracle walks the full 600-step BVH per pixel on CPU)
BUILDERS = {
    "quad": (scenes.scene_quad, 128, 8),
    "cube": (scenes.scene_cube, 128, 8),
    "suzanne": (scenes.scene_suzanne, 128, 8),
    "lucy": (scenes.scene_lucy, 96, 2),
    "dragon": (scenes.scene_dragon, 96, 2),
    # not a triangle scene, but the same our-own-golden tier: the ~490-
    # sphere RTIOW cover scene (scene 8) exceeds the reference's cap and
    # has no reference golden
    "cover": (scenes.scene_sphere_cover, 128, 8),
    # BASELINE configs 1-2 (driver-set scenes, no reference golden)
    "rtiow_one_sphere": (scenes.scene_rtiow_one_sphere, 128, 8),
    "rtiow_three_spheres": (scenes.scene_rtiow_three_spheres, 128, 8),
}


def render(name):
    builder, size, frames = BUILDERS[name]
    sd = builder(size, size)
    r = ProgressiveRenderer(sd)
    r.set_time(1000)
    r.draw_frames(frames)
    return r


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_triangle_golden(name):
    r = render(name)
    golden = open(os.path.join(GOLDEN_DIR, f"{name}.ppm")).read()
    ok, pct = compare_ppm(render_ppm(r.image), golden, 0.05)
    assert ok, f"{name}: {pct:.4f}% > 0.05%"


if __name__ == "__main__":  # regeneration entry point
    from rt.render import write_ppm
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in BUILDERS:
        write_ppm(os.path.join(GOLDEN_DIR, f"{name}.ppm"),
                  render(name).image)
        print(f"regenerated {name}.ppm")
