"""Wavefront OBJ loader (host-side, pure Python with optional C++ fast path).

Behavioral contract from the reference (src/geometry/mesh.rs:11-61, which uses
tobj with default LoadOptions — no triangulation, positions only):

- only vertex positions survive: normals/colors are parsed by the reference
  but never uploaded (src/scene/bvh/tree.rs:78-80 consumes only .position);
- multi-object files are merged with running index offsets — since OBJ `f`
  indices are global over all `v` lines, parsing positions and faces globally
  reproduces the reference's merge exactly;
- parse failure degrades silently to an empty mesh (mesh.rs:54-59);
- expected counts (mesh.rs tests): cube.obj → 8 vertices / 36 indices,
  suzanne.obj → 515 / 2937.

The C++ fast path (native/librtnative.so, built from native/rt_native.cpp) is
used automatically when present — the reference's loader is native Rust, ours
is native C++; the Python path is the portable fallback and oracle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


@dataclass
class Mesh:
    vertices: np.ndarray  # (V, 3) f32 positions
    indices: np.ndarray   # (3F,) u32
    material: tuple = ()  # (albedo(3,), param, kind) — attached by caller

    @property
    def num_triangles(self) -> int:
        return len(self.indices) // 3


def _parse_obj_python(text: str):
    verts = []
    faces = []
    for line in text.splitlines():
        if line.startswith("v "):
            parts = line.split()
            verts.append((np.float32(parts[1]), np.float32(parts[2]),
                          np.float32(parts[3])))
        elif line.startswith("f "):
            parts = line.split()[1:]
            idx = []
            for p in parts:
                tok = p.split("/")[0]
                k = int(tok)
                # OBJ is 1-based; negative indices are relative to the end.
                idx.append(k - 1 if k > 0 else len(verts) + k)
            # fan-triangulate (assets are pre-triangulated; fan matches tobj
            # for triangles trivially)
            for t in range(1, len(idx) - 1):
                faces.extend((idx[0], idx[t], idx[t + 1]))
    v = np.array(verts, np.float32).reshape(-1, 3)
    f = np.array(faces, np.uint32)
    return v, f


_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from rt.scene import native_bridge
            _native = native_bridge if native_bridge.available() else None
        except Exception:
            _native = None
    return _native


def load_obj(source, material=None, use_native: bool = True) -> Mesh:
    """Load an OBJ from bytes/str/path.  Silent empty mesh on failure,
    matching mesh.rs:54-59."""
    try:
        if isinstance(source, (bytes, bytearray)):
            text = source.decode("utf-8", errors="replace")
        elif isinstance(source, str) and "\n" not in source and os.path.exists(source):
            with open(source) as f:
                text = f.read()
        else:
            text = source
        native = _get_native() if use_native else None
        if native is not None:
            try:
                v, f = native.parse_obj(text)
            except Exception:
                v, f = _parse_obj_python(text)
        else:
            v, f = _parse_obj_python(text)
    except Exception:
        v = np.zeros((0, 3), np.float32)
        f = np.zeros((0,), np.uint32)
    return Mesh(vertices=v, indices=f, material=material or ())


def load_asset(name: str, material=None) -> Mesh:
    """Load one of the bundled reference meshes (src/assets/*.obj)."""
    return load_obj(os.path.join(ASSET_DIR, name), material)
