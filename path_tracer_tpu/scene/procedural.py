"""Procedural test scenes built in code (no file I/O).

Used by the graft entry point, the benchmark fallback, and tests that need a
scene without depending on the reference checkout. The Cornell-style box
mirrors the graded config #2 in BASELINE.md.
"""
from __future__ import annotations

import math

from path_tracer_tpu.scene import isf
from path_tracer_tpu.scene.device_scene import DeviceScene, build_device_scene


def _quad(a, b, c, d, normal):
    """Two triangles for the quad a-b-c-d (counter-clockwise)."""

    def vert(p, uv):
        return isf.Vertex(position=tuple(p), normal=tuple(normal),
                          tex_coords=uv)

    return [
        (vert(a, (0.0, 0.0)), vert(b, (1.0, 0.0)), vert(c, (1.0, 1.0))),
        (vert(a, (0.0, 0.0)), vert(c, (1.0, 1.0)), vert(d, (0.0, 1.0))),
    ]


def _mat(albedo=(1.0, 1.0, 1.0), emissive=(0.0, 0.0, 0.0), opacity=1.0,
         metalness=0.0, roughness=1.0) -> isf.Material:
    return isf.Material(
        albedo=isf.Channel3(factor=albedo),
        emissive=isf.Channel3(factor=emissive),
        opacity=isf.Channel1(factor=opacity),
        metalness=isf.Channel1(factor=metalness),
        roughness=isf.Channel1(factor=roughness),
    )


def _camera(pos=(0.0, 1.0, 3.2), fov_deg=60.0) -> isf.Camera:
    # Identity rotation looking down -z, translated to pos (column-major:
    # transform[3] is the translation column, ref camera.rs:42-48).
    t = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [float(pos[0]), float(pos[1]), float(pos[2]), 1.0],
    ]
    return isf.Camera(transform=t, fov=math.radians(fov_deg), zfar=100.0,
                      znear=0.01)


def cornell_scene() -> isf.Scene:
    """Cornell-style box: colored walls, two spheres, one point light."""
    s = 1.5  # half-extent
    tris = []
    # floor (y=0), ceiling (y=2s), back wall (z=-s)
    tris += _quad((-s, 0, s), (s, 0, s), (s, 0, -s), (-s, 0, -s), (0, 1, 0))
    tris += _quad((-s, 2 * s, -s), (s, 2 * s, -s), (s, 2 * s, s),
                  (-s, 2 * s, s), (0, -1, 0))
    tris += _quad((-s, 0, -s), (s, 0, -s), (s, 2 * s, -s), (-s, 2 * s, -s),
                  (0, 0, 1))
    white = isf.Mesh(triangles=tris, material=_mat(albedo=(0.73, 0.73, 0.73)))

    left = isf.Mesh(
        triangles=_quad((-s, 0, s), (-s, 0, -s), (-s, 2 * s, -s),
                        (-s, 2 * s, s), (1, 0, 0)),
        material=_mat(albedo=(0.65, 0.05, 0.05)),
    )
    right = isf.Mesh(
        triangles=_quad((s, 0, -s), (s, 0, s), (s, 2 * s, s), (s, 2 * s, -s),
                        (-1, 0, 0)),
        material=_mat(albedo=(0.12, 0.45, 0.15)),
    )
    mirror = isf.Sphere(radius=0.5, center=(-0.55, 0.5, -0.4),
                        material=_mat(albedo=(0.9, 0.9, 0.9), metalness=1.0,
                                      roughness=0.05))
    diffuse = isf.Sphere(radius=0.45, center=(0.6, 0.45, 0.3),
                         material=_mat(albedo=(0.7, 0.6, 0.2), roughness=0.6))
    light = isf.PointLight(position=(0.0, 2.6, 0.5), color=(120.0, 120.0, 120.0))

    return isf.Scene(
        models=[white, left, right, mirror, diffuse],
        camera=_camera(),
        lights=[light],
        background=(0.0, 0.0, 0.0),
    )


def sphere_grid_scene(n: int = 5) -> isf.Scene:
    """n x n analytic-sphere metalness x roughness grid with point lights —
    same shape as the reference's `spheres` test scene (SURVEY §2a #31)."""
    models = []
    for i in range(n):
        for j in range(n):
            metal = i / max(1, n - 1)
            rough = max(0.05, j / max(1, n - 1))
            models.append(
                isf.Sphere(
                    radius=0.4,
                    center=(1.1 * (i - (n - 1) / 2), 1.1 * (j - (n - 1) / 2),
                            0.0),
                    material=_mat(albedo=(0.8, 0.3, 0.3), metalness=metal,
                                  roughness=rough),
                )
            )
    lights = [
        isf.PointLight(position=(3.0, 3.0, 4.0), color=(400.0, 400.0, 400.0)),
        isf.PointLight(position=(-3.0, -3.0, 4.0), color=(200.0, 200.0, 250.0)),
    ]
    return isf.Scene(models=models, camera=_camera(pos=(0.0, 0.0, 7.0)),
                     lights=lights, background=(0.05, 0.05, 0.08))


def cornell_device_scene() -> DeviceScene:
    return build_device_scene(cornell_scene(), root=".")


def sphere_grid_device_scene(n: int = 5) -> DeviceScene:
    return build_device_scene(sphere_grid_scene(n), root=".")
