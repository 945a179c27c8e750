from rt.scene import bvh, objloader, scenes  # noqa: F401
