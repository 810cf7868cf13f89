"""White-furnace energy-conservation tests (statistical).

The reference pins these scenes by SHA-1 hash (ref: src/main.rs:140-165),
which is not portable across RNG bitstreams (SURVEY §4). The portable
assertion is the physics the scenes encode: white materials under a uniform
pi background should (approximately) reproduce the background — the render
should be statistically FLAT at the background level.
"""
import numpy as np


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


def test_white_furnace_indirect(reference_scenes):
    """No lights, bg = pi, white mirror-ish spheres: mean radiance over the
    whole frame should sit at the background level."""
    img = _render_scene(reference_scenes, "white_furnace_indirect", bounces=4)
    mean = img.mean()
    assert np.isfinite(img).all()
    # 4-bounce truncation + non-perfectly-energy-conserving CT loses a bit of
    # energy on sphere pixels; the frame mean must still be within 15% of pi.
    assert abs(mean - 3.14) / 3.14 < 0.15, f"frame mean {mean} vs 3.14"


def test_white_furnace_direct(reference_scenes):
    """bounces=0 with a unit directional light: finite, flat-ish field near
    the background level; no pixel should exceed bg + direct bound."""
    img = _render_scene(reference_scenes, "white_furnace_direct", bounces=0)
    assert np.isfinite(img).all()
    mean = img.mean()
    assert 1.0 < mean < 4.5, f"frame mean {mean}"
