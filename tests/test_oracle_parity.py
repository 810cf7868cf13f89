"""Wavefront renderer vs the INDEPENDENT scalar oracle (tests/oracle/).

This is the cross-implementation gate SURVEY §4 calls for in place of the
reference's non-portable SHA-1 goldens (ref src/main.rs:70-166): the oracle
is a direct per-pixel port of the reference integrator sharing no code with
path_tracer_tpu, frozen at converged sample counts by
tests/tools/gen_oracle_goldens.py. A wrong constant in the framework's
BRDF/integrator cannot hide here the way it could in self-frozen goldens.

Cases include bounces=6 (Russian roulette actually fires — ref
utils.rs:23-31 needs bounce>3) and a 12-deep stacked-alpha scene (deeper
than the default alpha_walk_steps).

Both renderers draw DIFFERENT RNG streams, so the comparison is statistical:
post-tonemap mean |diff| over finite pixels, plus a pre-tonemap mean-energy
check. Tolerances were chosen ~2x above the measured same-renderer
two-seed noise floor at these sample counts.
"""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "goldens" / "oracle"
REPO = Path(__file__).resolve().parents[1]

# case -> (mean u8 tol, walk steps override, energy rtol)
#
# Sphere scenes get a wider energy band (4%): the reference's f32 shadow
# acne at grazing sphere hits (see the oracle's PRECISION note) depends on
# exact fp association (FMA vs separate mul+add), which legitimately differs
# between XLA and scalar NumPy — the acne FRACTION matches only to a few
# percent. The band is still ~3x tighter than the 10-20% class of bug this
# gate exists to catch (it caught exactly such a sphere-quadratic bug).
CASES = {
    "cube": (2.0, None, 0.02),
    "reflection": (2.0, None, 0.02),
    "spheres": (2.5, None, 0.04),
    "head": (2.5, None, 0.02),
    # 3.1: deep-alpha walks (auto bound = 55 here) got their own widened RNG
    # site layout (ops/rng.site_layout) after the review found walk steps
    # >= 38 reusing the bounce's GGX/RR uniforms; the decorrelated streams
    # shifted this stochastic comparison from 2.99 to 3.00 mean |u8 diff| —
    # Monte-Carlo noise at this spp, not an integrator change.
    "alpha_transparency": (3.1, None, 0.02),
    "white_furnace_direct": (2.0, None, 0.02),
    "white_furnace_indirect": (2.5, None, 0.02),
    "cube_rr_b6": (2.0, None, 0.02),
    "spheres_rr_b6": (2.5, None, 0.04),
    # 13 stacked surfaces, walked with the DEFAULT auto bound
    # (num_transparent_hits + 1): pins that the auto-sized re-cast walk
    # covers the reference's full sorted-hit iteration with no override.
    "deep_alpha": (2.5, None, 0.02),
    # Textured showcase (the bench workload class): terrain albedo/normal/
    # roughness textures + alpha-cutout foliage + emissive billboard,
    # through the opacity-PARTITIONED walks. 48 spp -> slightly wider band.
    "showcase_tex": (3.2, None, 0.02),
    # BASELINE.md graded config #3 at 256^2: glTF-CONVERTED mesh (12k tris,
    # BVH auto-engaged) + translucent dome + checker texture. 24 spp (the
    # 65k-pixel mean averages residual per-pixel MC noise down).
    "glb_converted_256": (3.0, None, 0.02),
    "glb_converted_512": (3.0, None, 0.02),
    # Multi-material GLB with TWO distinct converted opacity textures:
    # the multi-page fused-walk path on real converted content.
    "glb_multi_opacity": (3.0, None, 0.02),
}


def _render_wavefront(scene_path, width, height, spp, bounces, walk_steps):
    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import render_pixel_sums
    from path_tracer_tpu.scene import load_scene

    scene = load_scene(scene_path)
    kw = {}
    if walk_steps is not None:
        kw = dict(alpha_walk_steps=walk_steps, shadow_walk_steps=walk_steps)
    spec = IntegratorSpec(bounces=bounces, **kw)
    acc = render_pixel_sums(scene, width, height, 1, spp, spec,
                            samples_per_launch=min(spp, 16))
    return (np.asarray(acc) / spp).reshape(height, width, 3)


@pytest.mark.parametrize("case", sorted(CASES))
def test_oracle_parity(case):
    from tests.oracle.reference_oracle import post_process

    path = GOLDEN / f"{case}.npz"
    if not path.exists():
        pytest.skip(f"oracle golden {case} not generated")
    z = np.load(path)
    oracle = z["radiance"].astype(np.float64)
    w, h, spp, bounces = (int(z["width"]), int(z["height"]), int(z["spp"]),
                          int(z["bounces"]))
    from tests.oracle.case_scenes import resolve_scene

    scene_path = resolve_scene(str(z["scene"]))
    tol, walk, energy_rtol = CASES[case]

    wave = _render_wavefront(scene_path, w, h, spp, bounces, walk)

    finite = np.isfinite(oracle).all(axis=-1) & np.isfinite(wave).all(axis=-1)
    assert finite.mean() > 0.99, f"{case}: too many non-finite pixels"

    # Pre-tonemap global energy parity (catches wrong constants that shift
    # total radiance but survive the tonemap's compression).
    om = oracle[finite].mean()
    wm = wave[finite].mean()
    assert abs(om - wm) <= max(energy_rtol * om, 5e-4), \
        f"{case}: radiance mean {wm:.5f} vs oracle {om:.5f}"

    # Post-tonemap pixelwise parity (the user-visible image).
    o8 = post_process("FILMIC", oracle).astype(np.int64)
    w8 = post_process("FILMIC", np.maximum(wave, 0.0)).astype(np.int64)
    diff = np.abs(o8 - w8)[finite]
    assert diff.mean() <= tol, \
        f"{case}: mean |u8 diff| {diff.mean():.2f} > {tol}"
    assert np.percentile(diff, 99) <= 40, \
        f"{case}: p99 |u8 diff| {np.percentile(diff, 99):.0f}"
