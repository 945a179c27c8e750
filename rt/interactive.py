"""Orbit-camera controller — the interaction model of
src/camera_controller.rs, decoupled from any window system.

The reference couples this to winit mouse events; here the same spherical
state machine (drag = orbit, scroll = zoom, phi clamped to 0.1..pi-0.1) is a
plain class whose ``to_camera()`` produces the w=0 CameraUniform-style camera
(focal_length hardcoded to 10, blur 0 — camera_controller.rs:124-125).
Any front end (jupyter widget, terminal keys) can drive it; the progressive
renderer must be reset whenever ``has_moved`` is set (the invariant at
src/app.rs:134-137).
"""

from __future__ import annotations

import math

from rt.core.camera import Camera, orbit_uniform


class OrbitCamera:
    def __init__(self, aspect_ratio: float = 1.0):
        self.radius = 5.0
        self.theta = 0.0
        self.phi = math.pi / 4.0
        self.fov = math.radians(45.0)
        self.aspect_ratio = aspect_ratio
        self.target = (0.0, 0.0, 0.0)
        self.zoom_speed = 0.1
        self.orbit_speed = 0.01
        self.min_radius = 1.0
        self.max_radius = 20.0
        self.has_moved = False
        self._dragging = False
        self._last = (0.0, 0.0)
        self.update_position()

    def update_position(self):
        """camera_controller.rs:59-70 — spherical -> cartesian, phi clamp."""
        self.phi = min(max(self.phi, 0.1), math.pi - 0.1)
        x = self.radius * math.sin(self.phi) * math.cos(self.theta)
        y = self.radius * math.cos(self.phi)
        z = self.radius * math.sin(self.phi) * math.sin(self.theta)
        tx, ty, tz = self.target
        self.position = (tx + x, ty + y, tz + z)
        self.has_moved = True

    def handle_mouse_input(self, pressed: bool):
        self._dragging = pressed

    def handle_mouse_motion(self, x: float, y: float):
        """camera_controller.rs:78-90 (drag orbits; y inverted)."""
        if self._dragging:
            dx = x - self._last[0]
            dy = y - self._last[1]
            self.theta += dx * self.orbit_speed
            self.phi -= dy * self.orbit_speed
            self.update_position()
        self._last = (x, y)

    def handle_scroll(self, amount: float):
        """camera_controller.rs:92-102."""
        self.radius -= amount * self.zoom_speed * self.radius
        self.radius = min(max(self.radius, self.min_radius), self.max_radius)
        self.update_position()

    def resize(self, width: int, height: int):
        self.aspect_ratio = width / height

    def reset_movement_flag(self):
        self.has_moved = False

    def to_camera(self) -> Camera:
        """camera_controller.rs:116-129 (w=0 uniform, fl=10, blur=0)."""
        return orbit_uniform(self.position, self.target, self.fov)
