from rt.core import rng, vecmath, camera, sphere, triangle, materials, trace  # noqa: F401
