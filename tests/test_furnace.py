"""White-furnace energy-conservation tests (analytic).

The reference pins these scenes by SHA-1 hash (ref: src/main.rs:140-165),
which is not portable across RNG bitstreams (SURVEY §4). The portable
assertions here are ANALYTIC:

- direct furnace (bounces=0): every object is a front-facing quad cluster
  lit at ~normal incidence by the unit directional light, so each
  material's pixels form a plateau at a CLOSED-FORM Cook-Torrance value
  computed in this file from the spec formulas (cook_torrance.rs) — no code
  shared with either renderer. Background pixels are exactly pi.
- indirect furnace: background pixels are exactly pi; the frame mean is
  anchored to the INDEPENDENT oracle's converged value (the 4-bounce CT
  truncation loss is real physics of this BRDF, not a free parameter).
"""
import json
import math
from pathlib import Path

import numpy as np

PI = math.pi


def _render_scene(scenes_root, name, bounces, samples=32, wh=(64, 48)):
    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import render_pixel_sums
    from path_tracer_tpu.scene import load_scene

    scene = load_scene(scenes_root / name / "scene.isf")
    w, h = wh
    spec = IntegratorSpec(bounces=bounces, alpha_walk_steps=2,
                          shadow_walk_steps=2)
    acc = render_pixel_sums(scene, w, h, 1, samples, spec,
                            samples_per_launch=samples)
    return (acc / samples).reshape(h, w, 3)


def _ct_eval_normal_incidence(metal: float, rough: float, albedo: float):
    """Closed-form eval_direct at n = v = l = h (spec: cook_torrance.rs).

    D = a^2 / (pi (ndh^2 (a^2-1) + 1)^2) with a = rough^2 and ndh = 1
      = 1 / (pi a^2)
    F = f0 = 0.04 (1-m) + albedo m          (cos = 1 kills the pow5 term)
    G = 1                                    (ndv = ndl = 1)
    spec = D F G / 4 * cos(=1);  diffuse = (1-F)(1-m) albedo / pi
    """
    f0 = 0.04 * (1.0 - metal) + albedo * metal
    diffuse = (1.0 - f0) * (1.0 - metal) * albedo / PI
    if rough < 0.1:
        # Mirror-like (clamped to 1e-4): the GGX spike subtends ~a radians —
        # measure-zero under pixel jitter unless the view exactly mirrors
        # the light, so the plateau is the diffuse term alone.
        return diffuse
    a = rough * rough
    spec = (1.0 / (PI * a * a)) * f0 / 4.0
    return diffuse + spec


def test_white_furnace_direct(reference_scenes):
    scene_json = json.loads(
        (Path(reference_scenes) / "white_furnace_direct" / "scene.isf")
        .read_text())
    expected = sorted({
        _ct_eval_normal_incidence(
            m["material"]["metalness"]["factor"],
            m["material"]["roughness"]["factor"],
            m["material"]["albedo"]["factor"][0])
        for m in scene_json["models"]
    })

    img = _render_scene(reference_scenes, "white_furnace_direct", bounces=0)
    assert np.isfinite(img).all()
    vals = img[..., 0].ravel()  # white scene: channels identical

    # Background pixels: exactly the pi background (no light term on miss).
    bg = np.abs(vals - 3.14) < 1e-3
    assert bg.sum() > 0.2 * vals.size

    # Each material plateau present within 5% (normal-incidence closed form;
    # the fov half-diagonal is ~0.25 rad so real shading deviates <~4%).
    remaining = vals[~bg]
    classified = np.zeros(remaining.shape, bool)
    for e in expected:
        tol = max(0.05 * e, 5e-3)  # metal-1 mirror plateau is ~0
        cls = np.abs(remaining - e) < tol
        assert cls.sum() > 0, f"no pixels near analytic plateau {e:.4f}"
        assert abs(remaining[cls].mean() - e) <= max(0.03 * e, 3e-3)
        classified |= cls
    # The majority of non-background pixels sit on some analytic plateau;
    # the rest are the cubes' SIDE faces (the 12-tri objects are cubes, so
    # glancing-incidence side pixels shade off-plateau) and edge pixels
    # mixing two plateaus under jitter.
    assert classified.mean() > 0.5


def test_white_furnace_indirect(reference_scenes):
    img = _render_scene(reference_scenes, "white_furnace_indirect", bounces=4)
    assert np.isfinite(img).all()
    vals = img[..., 0].ravel()

    bg = np.abs(vals - 3.14) < 1e-3
    assert bg.sum() > 0.2 * vals.size

    # Frame mean anchored to the independent oracle's converged value
    # (tests/goldens/oracle; the 4-bounce truncation + CT non-conservation
    # loss is a property of the BRDF, reproduced by both implementations).
    golden = Path(__file__).parent / "goldens" / "oracle" / \
        "white_furnace_indirect.npz"
    if golden.exists():
        oracle_mean = float(np.load(golden)["radiance"].mean())
        assert abs(img.mean() - oracle_mean) / oracle_mean < 0.04, \
            f"frame mean {img.mean():.4f} vs oracle {oracle_mean:.4f}"
    else:
        assert abs(img.mean() - 3.14) / 3.14 < 0.15
