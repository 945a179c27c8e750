"""Fused Pallas TPU kernels — the device-native render path.

The reference's WGSL fragment shaders (shader_sphere.wgsl / shader_tris.wgsl)
become fused Pallas kernels: one kernel invocation per pixel tile traces the
full path (RNG seed → camera ray → bounce loop → sky) and writes the frame's
color, with primitives broadcast from SMEM/VMEM scalars so there are ZERO
per-lane gathers — the VPU analog of the GPU's SIMT model, minus the memory
divergence.
"""

from rt.kernels.dispatch import render_color

__all__ = ["render_color"]
