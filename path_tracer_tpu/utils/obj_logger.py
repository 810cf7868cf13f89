"""Wavefront-OBJ ray dumper for visual debugging in a 3D tool.

The reference ships this as dead code (src/logger.rs:12-24 — never declared
as a module). Here it is a living utility: dump any batch of rays (or the
camera wavefront of a scene) as OBJ line primitives, open the file in
Blender/MeshLab, and see exactly where the rays go.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class ObjRayLogger:
    """Accumulates line segments; write() emits a single OBJ file.

    Mirrors the reference's format: two `v` rows + one `l` row per ray
    (src/logger.rs:13-23), with vertex indices 1-based as OBJ requires.
    """

    def __init__(self):
        self._verts: list[np.ndarray] = []

    def line(self, start, end) -> None:
        self._verts.append(np.asarray(start, np.float32).reshape(3))
        self._verts.append(np.asarray(end, np.float32).reshape(3))

    def ray(self, origin, direction, length: float = 1.0) -> None:
        o = np.asarray(origin, np.float32).reshape(3)
        d = np.asarray(direction, np.float32).reshape(3)
        self.line(o, o + d * length)

    def rays(self, origins, directions, length: float = 1.0) -> None:
        """Batch form: origins/directions [N,3]."""
        o = np.asarray(origins, np.float32).reshape(-1, 3)
        d = np.asarray(directions, np.float32).reshape(-1, 3)
        for i in range(o.shape[0]):
            self.ray(o[i], d[i], length)

    def write(self, path="log.obj") -> None:
        path = Path(path)
        with open(path, "w") as f:
            for v in self._verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for i in range(0, len(self._verts), 2):
                f.write(f"l {i + 1} {i + 2}\n")


def dump_camera_rays(scene, width: int, height: int, path="log.obj",
                     stride: int = 16, length: float = 5.0) -> None:
    """Dump every stride-th camera ray of a scene to OBJ."""
    import jax.numpy as jnp

    from path_tracer_tpu.ops.camera import generate_rays

    ids = jnp.arange(0, width * height, stride, dtype=jnp.int32)
    o, d = generate_rays(ids, width, height, scene, 0, 0, jitter=False)
    logger = ObjRayLogger()
    logger.rays(np.asarray(o), np.asarray(d), length)
    logger.write(path)
