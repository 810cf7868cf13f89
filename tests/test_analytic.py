"""Analytic (closed-form) radiance oracles — independent of BOTH the Rust
reference and the Python scalar oracle (tests/oracle/reference_oracle.py).

VERDICT r4 next #5: the oracle-parity suite compares two implementations
written by the SAME author from the same reading of the Rust; a shared
misreading would pass both sides. These tests pin configurations whose
radiance has a CLOSED FORM derivable by hand from the published
Cook-Torrance formulas (ref src/renderer/brdf/cook_torrance.rs:34-117 and
src/renderer/mod.rs:245-331), asserted against explicit arithmetic — not
against any rendered golden.

Geometry used throughout: a quad in the z=0 plane with normal n=(0,0,1),
camera on the +z axis with a TINY vertical fov (2e-3 rad) so every
jittered camera ray is perpendicular to the quad within |dx|,|dy| <=
~2e-3; all first-order cosine errors are O(1e-6) and the asserts use
rtol=2e-3.

Derivation at perpendicular geometry (n = v = l = h = (0,0,1)):
  D  = a^2 / (pi ((n.h)^2 (a^2-1) + 1)^2), a = roughness^2   (:167-178)
     = a^2 / (pi a^4) = 1 / (pi a^2);  roughness=1 -> D = 1/pi.
  G1 = x / (x (1-k) + k) with x = n.v = n.l = 1 -> G1 = 1, G = 1  (:149-165)
  F  = F0 + (1-F0)(1 - v.h)^5 = F0 at v.h = 1                (:143-147)
  spec = D G F / (4 (n.v)(n.l)) * cos = D F0 / 4             (:34-56)
  diffuse = (1-F)(1-metal) albedo / pi * cos                 (:107-117)
  eval_direct = spec + diffuse (+ emissive, zero here)       (:57)
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.scene import isf
from path_tracer_tpu.scene.device_scene import build_device_scene
from path_tracer_tpu.scene.procedural import _mat, _quad

W, H = 4, 4
FOV = 2e-3  # radians; rays perpendicular to the quad within ~2e-3


def _camera_z(z: float) -> isf.Camera:
    t = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, float(z), 1.0],
    ]
    return isf.Camera(transform=t, fov=FOV, zfar=100.0, znear=0.01)


def _plane_quad(z: float, half: float = 2.0, material=None):
    return isf.Mesh(
        triangles=_quad((-half, -half, z), (half, -half, z),
                        (half, half, z), (-half, half, z), (0, 0, 1)),
        material=material if material is not None else _mat())


def _render_mean(scene, bounces, spp=2):
    s = build_device_scene(scene, root=".", use_bvh=False)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spec = IntegratorSpec(bounces=bounces, differentiable=False)
    acc = np.zeros(3)
    for k in range(spp):
        acc += np.asarray(
            render_wavefront(s, ids, W, H, jnp.int32(k), spec)).mean(axis=0)
    return acc / spp


# Shared material numbers for the direct-term tests.
ALBEDO = (0.6, 0.3, 0.2)
# Hand arithmetic (see module docstring; metal=0, roughness=1):
#   F0 = 0.04;  D = 1/pi;  spec = 0.04 / (4 pi) = 0.01 / pi
#   diffuse = 0.96 * albedo / pi
#   eval_direct = (0.01 + 0.96 * albedo_c) / pi   per channel c
EVAL_DIRECT = np.array([(0.01 + 0.96 * a) / math.pi for a in ALBEDO])


def test_directional_direct_closed_form():
    """Directional light straight down the normal: radiance must equal
    light_color * eval_direct with eval_direct derived by hand
    (ref mod.rs:248-262 direct term, cook_torrance.rs:34-58)."""
    color = (2.0, 1.5, 1.0)
    scene = isf.Scene(
        models=[_plane_quad(0.0, material=_mat(albedo=ALBEDO))],
        camera=_camera_z(5.0),
        lights=[isf.DirectionalLight(direction=(0.0, 0.0, -1.0),
                                     color=color)],
        background=(0.0, 0.0, 0.0),
    )
    got = _render_mean(scene, bounces=0)
    want = np.asarray(color) * EVAL_DIRECT
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_point_light_falloff_closed_form():
    """Point light on the normal at distance d: radiance must equal
    color / (4 pi d^2) * eval_direct — pins the dissipation constant
    (ref mod.rs:315-318) against hand arithmetic."""
    color = (400.0, 300.0, 200.0)
    d = 3.0
    scene = isf.Scene(
        models=[_plane_quad(0.0, material=_mat(albedo=ALBEDO))],
        camera=_camera_z(5.0),
        lights=[isf.PointLight(position=(0.0, 0.0, d), color=color)],
        background=(0.0, 0.0, 0.0),
    )
    got = _render_mean(scene, bounces=0)
    want = np.asarray(color) / (4.0 * math.pi * d * d) * EVAL_DIRECT
    # The hit point wanders by ~1e-2 across the 4x4 pixels (tiny fov), so
    # d^2 varies by ~1e-5 relative; rtol dominated by ray obliquity.
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_mirror_reflection_identity():
    """Pure mirror (metal=1, roughness=0 -> clamp 1e-4): one bounce must
    return albedo (x) background exactly — F = F0 = albedo at v.h = 1, the
    GGX sample pdf cancellation leaves weight |v.wm|/(|v.n||wm.n|) = 1 and
    G = 1, diffuse kd = (1-metal) = 0 (ref cook_torrance.rs:60-91,119-141).
    The roughness clamp (material_sample.rs:23) perturbs the sampled
    microfacet by O(a^2 = 1e-16): deterministic to float precision."""
    albedo = (0.9, 0.8, 0.7)
    bg = (0.5, 0.4, 0.8)
    scene = isf.Scene(
        models=[_plane_quad(0.0, material=_mat(albedo=albedo, metalness=1.0,
                                               roughness=0.0))],
        camera=_camera_z(5.0),
        lights=[],
        background=bg,
    )
    got = _render_mean(scene, bounces=1)
    want = np.asarray(albedo) * np.asarray(bg)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_shadow_transmittance_closed_form():
    """Two translucent factor-only occluders on the shadow path (behind
    the camera, so camera rays never hit them): the directional-light
    attenuation must be exactly (1-0.3)(1-0.5) = 0.35 — the occluder
    opacity product of ref mod.rs:283-299, by hand."""
    color = (2.0, 1.5, 1.0)
    scene = isf.Scene(
        models=[
            _plane_quad(0.0, material=_mat(albedo=ALBEDO)),
            # Occluders at z=7, z=8: above the z=5 camera, inside the
            # upward shadow column x,y ~ 0.
            _plane_quad(7.0, material=_mat(albedo=(0.5, 0.5, 0.5),
                                           opacity=0.3)),
            _plane_quad(8.0, material=_mat(albedo=(0.5, 0.5, 0.5),
                                           opacity=0.5)),
        ],
        camera=_camera_z(5.0),
        lights=[isf.DirectionalLight(direction=(0.0, 0.0, -1.0),
                                     color=color)],
        background=(0.0, 0.0, 0.0),
    )
    got = _render_mean(scene, bounces=0)
    want = 0.35 * np.asarray(color) * EVAL_DIRECT
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_furnace_single_scatter_closed_form():
    """Single-scatter white furnace: a white diffuse quad (albedo=1,
    roughness=1, metal=0) under a uniform background B with bounces=1.

    Hand derivation: bounce 0 hits the quad (no lights, no emissive), the
    GGX-sampled indirect ray leaves with throughput eval_indirect and
    bounce 1 always hits the background, so

        radiance = B * E[eval_indirect]

    where eval_indirect = diffuse + spec = (1-F)(1) albedo/pi cos(n.l)
    + G w F (ref :60-86). This expectation has no simple closed form, but
    it is BOUNDED analytically: every factor is nonnegative, and with
    albedo=1, F in [0.04, 1], G, w <= 1, cos <= 1 the integrand is <= 1/pi
    + 1 per sample... too loose to pin. Instead we pin the DETERMINISTIC
    sub-case roughness=0 metal=0: the mirror identity with F0=0.04 gives
    radiance = B*(0.04 + 0.96 * albedo/pi * cos) with cos = n.l = 1
    (the reflected ray is the normal at perpendicular view) — diffuse DOES
    contribute for metal=0. Hand numbers: 0.04 + 0.96/pi = 0.3455634."""
    bg = (1.0, 1.0, 1.0)
    scene = isf.Scene(
        models=[_plane_quad(0.0, material=_mat(albedo=(1.0, 1.0, 1.0),
                                               metalness=0.0,
                                               roughness=0.0))],
        camera=_camera_z(5.0),
        lights=[],
        background=bg,
    )
    got = _render_mean(scene, bounces=1)
    want = np.asarray(bg) * (0.04 + 0.96 / math.pi)
    np.testing.assert_allclose(got, want, rtol=2e-3)
