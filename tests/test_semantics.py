"""Integrator semantics tests pinning the reference's documented quirks.

Each test builds a minimal crafted scene and checks the wavefront integrator
reproduces the reference behavior exactly:

- Farthest-hit fallback: a ray that hit >= 1 surface NEVER escapes to the
  background; if no alpha-accept happens the FARTHEST visited hit shades
  (ref: src/renderer/mod.rs:188-205).
- Directional shadow attenuation is the product of (1-opacity) over
  occluders (ref mod.rs:283-299).
- Point lights: occluders beyond the light do not shadow
  (ref mod.rs:320-323).
- Point-light shadow samples the occluder's material at the ORIGINAL hit's
  UV (ref mod.rs:324 quirk).
- Point light radiance is color/(4 pi r^2) (ref mod.rs:315-318).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.scene import isf
from path_tracer_tpu.scene.device_scene import build_device_scene

PI = math.pi


def _quad_z(z, half, material, normal=(0, 0, 1)):
    """Axis-aligned quad at depth z facing +z."""
    def v(x, y, uv):
        return isf.Vertex(position=(x, y, z), normal=normal, tex_coords=uv)

    s = half
    return isf.Mesh(
        triangles=[
            (v(-s, -s, (0, 0)), v(s, -s, (1, 0)), v(s, s, (1, 1))),
            (v(-s, -s, (0, 0)), v(s, s, (1, 1)), v(-s, s, (0, 1))),
        ],
        material=material,
    )


def _mat(albedo=(1, 1, 1), emissive=(0, 0, 0), opacity=1.0, opacity_tex=None,
         roughness=1.0):
    return isf.Material(
        albedo=isf.Channel3(factor=albedo),
        emissive=isf.Channel3(factor=emissive),
        opacity=isf.Channel1(factor=opacity, texture=opacity_tex),
        metalness=isf.Channel1(factor=0.0),
        roughness=isf.Channel1(factor=roughness),
    )


def _cam():
    return isf.Camera(
        transform=[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 5, 1]],
        fov=math.radians(40), zfar=100, znear=0.01,
    )


def _render_center(scene, bounces=0, spp=64, steps=8):
    import jax

    dev = build_device_scene(scene, root=".")
    spec = IntegratorSpec(bounces=bounces, alpha_walk_steps=steps,
                          shadow_walk_steps=steps, tri_block=256)
    ids = jnp.zeros((8,), jnp.int32)  # pixel 0 of a 1x1 image -> center ray

    @jax.jit
    def run(dev):
        def body(acc, s):
            return acc + render_wavefront(dev, ids, 1, 1, s, spec), None

        acc, _ = jax.lax.scan(body, jnp.zeros((8, 3)),
                              jnp.arange(1, spp + 1))
        return acc

    return np.asarray(run(dev)).mean(axis=0) / spp


def test_farthest_hit_fallback_never_escapes():
    """Two fully transparent-but-rejected quads (opacity 0 < 0.001): no hit
    accepts, so the FARTHEST quad must shade — never the background."""
    near = _quad_z(1.0, 3.0, _mat(opacity=0.0, emissive=(1.0, 0.0, 0.0)))
    far = _quad_z(-1.0, 3.0, _mat(opacity=0.0, emissive=(0.0, 1.0, 0.0)))
    scene = isf.Scene(models=[near, far], camera=_cam(), lights=[],
                      background=(0.0, 0.0, 100.0))
    col = _render_center(scene, bounces=0)
    # Shades the far (green-emissive) quad; no background blue leaks.
    assert col[1] == pytest.approx(1.0, abs=1e-5)
    assert col[0] == pytest.approx(0.0, abs=1e-5)
    assert col[2] == pytest.approx(0.0, abs=1e-5)


def test_alpha_accept_probability():
    """opacity 0.5 quad in front of an emissive quad: the front quad accepts
    ~50% of samples; with both emissive the mix is ~[0.5, 0.5]."""
    front = _quad_z(1.0, 3.0, _mat(opacity=0.5, emissive=(1.0, 0.0, 0.0)))
    back = _quad_z(-1.0, 3.0, _mat(opacity=1.0, emissive=(0.0, 1.0, 0.0)))
    scene = isf.Scene(models=[front, back], camera=_cam(), lights=[],
                      background=(0.0, 0.0, 0.0))
    col = _render_center(scene, bounces=0, spp=512)
    assert col[0] == pytest.approx(0.5, abs=0.08)
    assert col[1] == pytest.approx(0.5, abs=0.08)


def _small_quad(cx, cy, z, half, material):
    def v(x, y, uv):
        return isf.Vertex(position=(x, y, z), normal=(0, 0, 1),
                          tex_coords=uv)

    s = half
    return isf.Mesh(
        triangles=[
            (v(cx - s, cy - s, (0, 0)), v(cx + s, cy - s, (1, 0)),
             v(cx + s, cy + s, (1, 1))),
            (v(cx - s, cy - s, (0, 0)), v(cx + s, cy + s, (1, 1)),
             v(cx - s, cy + s, (0, 1))),
        ],
        material=material,
    )


def test_directional_shadow_opacity_product():
    """Two occluders with opacity 0.5 and 0.25 on the (diagonal) shadow
    path: radiance scales by the product of (1-op). The light comes in
    diagonally so the occluders sit OUTSIDE the camera's view path."""
    surface = _quad_z(0.0, 3.0, _mat(albedo=(1, 1, 1)))
    # light dir (-1,0,-1)/sqrt2 -> shadow rays leave along (+1,0,+1)/sqrt2.
    # Camera at (-1,0,5) with a 5-degree fov: its rays hit the surface near
    # x=-1 and never cross the occluders, which sit on the diagonal shadow
    # path (z=1 crossing x in [-0.25,0.25]; z=2 crossing x in [0.75,1.25]).
    inv = 1.0 / math.sqrt(2.0)
    light = isf.DirectionalLight(direction=(-inv, 0, -inv), color=(1, 1, 1))
    occ1 = _small_quad(0.0, 0.0, 1.0, 0.5, _mat(opacity=0.5))
    occ2 = _small_quad(1.0, 0.0, 2.0, 0.5, _mat(opacity=0.25))
    cam = isf.Camera(
        transform=[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [-1, 0, 5, 1]],
        fov=math.radians(5), zfar=100, znear=0.01,
    )

    def radiance(models):
        scene = isf.Scene(models=models, camera=cam, lights=[light],
                          background=(0, 0, 0))
        return _render_center(scene, bounces=0, spp=16)[0]

    unshadowed = radiance([surface])
    shadowed = radiance([surface, occ1, occ2])
    assert unshadowed > 0.05
    assert shadowed / unshadowed == pytest.approx((1 - 0.5) * (1 - 0.25),
                                                  rel=1e-4)


def test_point_light_behind_cutoff_and_falloff():
    """An occluder BEYOND the point light must not shadow; radiance follows
    color/(4 pi r^2). Diagonal geometry keeps the occluders out of the
    camera path (camera at (-1,0,5), 5-degree fov)."""
    surface = _quad_z(0.0, 3.0, _mat(albedo=(1, 1, 1)))
    light = isf.PointLight(position=(1.0, 0, 2.0), color=(50, 50, 50))
    # Shadow ray from (~-1,0,0) toward (1,0,2): crosses z=1 near x=0; its
    # extension beyond the light crosses z=3 near x=2.
    occ_between = _small_quad(0.0, 0.0, 1.0, 0.5, _mat(opacity=1.0))
    occ_beyond = _small_quad(2.0, 0.0, 3.0, 0.5, _mat(opacity=1.0))
    cam = isf.Camera(
        transform=[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [-1, 0, 5, 1]],
        fov=math.radians(5), zfar=100, znear=0.01,
    )

    def rad(models):
        scene = isf.Scene(models=models, camera=cam, lights=[light],
                          background=(0, 0, 0))
        return _render_center(scene, bounces=0, spp=16)[0]

    base = rad([surface])
    assert base > 0.01
    assert rad([surface, occ_beyond]) == pytest.approx(base, rel=1e-5)
    assert rad([surface, occ_between]) == pytest.approx(0.0, abs=1e-6)

    # Falloff: diffuse = albedo/pi * cos * color/(4 pi r^2) at the surface
    # point (-1,0,0): r^2 = 8, cos = 2/sqrt(8).
    expected = (1.0 / PI) * (2.0 / math.sqrt(8.0)) * 50.0 / (4.0 * PI * 8.0)
    assert base == pytest.approx(expected, rel=0.05)


def _quirk_scene(tmp_path, light):
    """Shared geometry for the original-UV shadow-sampling quirk tests.

    Occluder opacity texture: left texel column transparent (0), right
    opaque (1). The camera hits the small surface quad at UV u~0.7 (right
    texel); the vertical shadow ray crosses the occluder at its own UV
    u~0.25 (left texel). Point lights sample the occluder at the ORIGINAL
    surface UV (mod.rs:324 quirk) -> shadowed; directional lights sample
    the occluder's own UV (mod.rs:291-295) -> lit.
    """
    import numpy as np
    from PIL import Image

    tex = np.zeros((2, 2), np.uint8)
    tex[:, 1] = 255
    Image.fromarray(tex, "L").save(tmp_path / "op.png")

    def v(x, y, z, uv):
        return isf.Vertex(position=(x, y, z), normal=(0, 0, 1),
                          tex_coords=uv)

    surface = isf.Mesh(
        triangles=[
            (v(-2.5, -0.5, 0, (0, 0)), v(-1.5, -0.5, 0, (1, 0)),
             v(-1.5, 0.5, 0, (1, 1))),
            (v(-2.5, -0.5, 0, (0, 0)), v(-1.5, 0.5, 0, (1, 1)),
             v(-2.5, 0.5, 0, (0, 1))),
        ],
        material=_mat(albedo=(1, 1, 1)),
    )
    occluder = isf.Mesh(
        triangles=[
            (v(-4, -4, 1, (0, 0)), v(4, -4, 1, (1, 0)), v(4, 4, 1, (1, 1))),
            (v(-4, -4, 1, (0, 0)), v(4, 4, 1, (1, 1)), v(-4, 4, 1, (0, 1))),
        ],
        material=_mat(opacity=1.0, opacity_tex="op.png"),
    )
    cam = isf.Camera(
        transform=[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [-2, 0, 5, 1]],
        fov=math.radians(10), zfar=100, znear=0.01,
    )
    scene = isf.Scene(models=[surface, occluder], camera=cam, lights=[light],
                      background=(0, 0, 0))
    dev = build_device_scene(scene, root=tmp_path)
    spec = IntegratorSpec(bounces=0, alpha_walk_steps=4, shadow_walk_steps=4,
                          tri_block=256)
    ids = jnp.zeros((8,), jnp.int32)
    return np.asarray(render_wavefront(dev, ids, 1, 1, jnp.int32(1),
                                       spec)).mean(axis=0)


def test_point_shadow_samples_original_uv(tmp_path):
    # Point light above the surface: quirk -> occluder opacity sampled at
    # the ORIGINAL surface UV (right texel, opaque) -> fully shadowed even
    # though the occluder is transparent where the shadow ray crosses it.
    light = isf.PointLight(position=(-2.0, 0.0, 3.0), color=(60, 60, 60))
    col = _quirk_scene(tmp_path, light)
    assert col[0] == pytest.approx(0.0, abs=1e-6)


def test_directional_shadow_samples_occluder_uv(tmp_path):
    # Same geometry, directional light: the occluder's OWN UV is sampled
    # (left texel, transparent) -> lit.
    light = isf.DirectionalLight(direction=(0, 0, -1), color=(1, 1, 1))
    col = _quirk_scene(tmp_path, light)
    assert col[0] > 0.25  # ~1/pi diffuse


def test_mirror_reflection():
    """Metal=1, roughness~0 floor acts as a mirror: one bounce reflects the
    camera ray into an emissive panel (ref: cook_torrance GGX with a~0 puts
    all indirect energy along the reflection direction)."""
    # Mirror floor at y=0; emissive panel on the ceiling at y=4 so the
    # reflected (upward) ray hits it. Camera looks down at the floor.
    def v(x, y, z, uv, n):
        return isf.Vertex(position=(x, y, z), normal=n, tex_coords=uv)

    # Winding chosen so the geometric face normal points +y, matching the
    # vertex normals (otherwise the backface flip inverts the mirror).
    floor = isf.Mesh(
        triangles=[
            (v(-3, 0, -3, (0, 0), (0, 1, 0)), v(3, 0, 3, (1, 1), (0, 1, 0)),
             v(3, 0, -3, (1, 0), (0, 1, 0))),
            (v(-3, 0, -3, (0, 0), (0, 1, 0)), v(-3, 0, 3, (0, 1), (0, 1, 0)),
             v(3, 0, 3, (1, 1), (0, 1, 0))),
        ],
        material=_mat(albedo=(1, 1, 1), roughness=0.02),
    )
    floor.material.metalness = isf.Channel1(factor=1.0)
    panel = isf.Mesh(
        triangles=[
            (v(-3, 4, -3, (0, 0), (0, -1, 0)), v(3, 4, -3, (1, 0), (0, -1, 0)),
             v(3, 4, 3, (1, 1), (0, -1, 0))),
            (v(-3, 4, -3, (0, 0), (0, -1, 0)), v(3, 4, 3, (1, 1), (0, -1, 0)),
             v(-3, 4, 3, (0, 1), (0, -1, 0))),
        ],
        material=_mat(emissive=(0.0, 3.0, 0.0)),
    )
    # Camera at (0,2,2) pitched steeply down toward the floor center.
    c, s = math.cos(-1.1), math.sin(-1.1)
    cam = isf.Camera(
        transform=[[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 2, 2, 1]],
        fov=math.radians(10), zfar=100, znear=0.01,
    )
    scene = isf.Scene(models=[floor, panel], camera=cam, lights=[],
                      background=(0, 0, 0))
    col = _render_center(scene, bounces=1, spp=64)
    # The mirror bounce must pick up the green panel emission strongly.
    assert col[1] > 1.0, col
    assert col[0] < 0.05 and col[2] < 0.05
