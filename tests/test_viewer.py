"""Terminal-viewer unit tests: ANSI rendering, orbit-key handling, and the
reset-on-move progressive invariant (src/app.rs:126-139)."""

import dataclasses
import math

import numpy as np

from rt.scene import scenes
from rt.viewer import TerminalViewer, image_to_ansi


def small_sd():
    sd = scenes.test_scene_metal(64, 32)
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=2))


def test_image_to_ansi_shape_and_colors():
    img = np.zeros((4, 3, 3), np.float32)
    img[0, :, 0] = 1.0  # top row red
    out = image_to_ansi(img)
    lines = out.split("\n")
    assert len(lines) == 2                      # 4 pixel rows -> 2 text rows
    assert "\x1b[38;2;255;0;0m" in lines[0]     # red foreground
    assert out.count("▀") == 6


def test_keys_update_camera_within_ranges():
    v = TerminalViewer(small_sd())
    v.camera.reset_movement_flag()
    assert v.handle_key("LEFT")
    assert v.camera.has_moved
    # zoom clamps at the orbit controller's limits
    for _ in range(100):
        v.handle_key("-")
    assert v.camera.radius <= 50.0
    for _ in range(100):
        v.handle_key("+")
    assert v.camera.radius >= 1.0
    # fov clamps to the egui slider range 30-120 deg (gui.rs:73)
    for _ in range(50):
        v.handle_key("]")
    assert math.degrees(v.camera.fov) <= 120.0 + 1e-6
    assert not v.handle_key("q")


def test_reset_on_move_invariant():
    v = TerminalViewer(small_sd())
    v.tick()
    assert v.renderer.frame_count > 0
    v.handle_key("RIGHT")                        # camera moved
    v.tick()
    # the accumulator restarted: frame_count == frames of ONE tick only
    assert v.renderer.frame_count == v.frames_per_tick
    assert "θ" in v.status_line()
