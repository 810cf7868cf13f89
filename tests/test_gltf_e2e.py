"""Real-mesh glTF end-to-end: authored GLB → converter → BVH render.

BASELINE.md graded config #3 exercises "glTF-converted mesh via BVH +
alpha". tests/tools/gen_test_glb.py authors a production-shaped GLB at test
time (13.6k-triangle terrain with a baseColor texture, a translucent dome
via baseColorFactor alpha, perspective camera, KHR point light); this test
converts it (ref: src/scene/gltf.rs:146-265 semantics) and renders through
the BVH + stochastic-alpha path, gating the BVH image against the
brute-force path on identical RNG streams.
"""
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from path_tracer_tpu.scene.gltf import convert_gltf_to_isf
    from tests.tools.gen_test_glb import write_glb

    td = tmp_path_factory.mktemp("glb")
    n_tris = write_glb(td / "terrain.glb")
    convert_gltf_to_isf(td / "terrain.glb", td / "isf")
    return td / "isf", n_tris


def test_convert_real_mesh(converted):
    out, n_tris = converted
    assert n_tris > 10_000
    files = sorted(p.name for p in out.iterdir())
    # Reference texture naming: albedo RGB + split-alpha gray opacity
    # (ref gltf.rs:27-45).
    assert "scene.isf" in files
    assert "albedo_tex_0.png" in files
    assert "alpha_tex_0.png" in files

    d = json.loads((out / "scene.isf").read_text())
    assert len(d["models"]) == 2
    # Translucent dome: baseColorFactor.a -> opacity factor (gltf.rs:90-99).
    assert d["models"][1]["material"]["opacity"]["factor"] == \
        pytest.approx(0.35)
    # KHR point light: color x intensity, size hardcoded 0.1 (gltf.rs:243).
    (light,) = d["lights"]
    assert light["type"] == "Point" and light["size"] == 0.1
    assert light["color"][0] == pytest.approx(1200.0)
    # ior hardcoded 1.0 (gltf.rs:112).
    assert d["models"][0]["material"]["ior"] == 1.0


def test_render_bvh_matches_brute(converted):
    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import render_pixel_sums
    from path_tracer_tpu.scene import load_scene

    out, _ = converted
    W, H, SPP = 64, 48, 2
    spec = IntegratorSpec(bounces=2)

    bvh_scene = load_scene(out / "scene.isf")
    assert bvh_scene.use_bvh and bvh_scene.sl_n_blocks > 10
    assert not bvh_scene.all_opaque  # the dome keeps the alpha walk alive

    img_bvh = render_pixel_sums(bvh_scene, W, H, 1, SPP, spec,
                                samples_per_launch=SPP) / SPP
    img_bvh = np.asarray(img_bvh)
    assert np.isfinite(img_bvh).all()
    assert 1e-3 < img_bvh.mean() < 1.0  # lit, not blown out

    from path_tracer_tpu.scene import isf
    from path_tracer_tpu.scene.device_scene import build_device_scene

    brute_scene = build_device_scene(isf.load(out / "scene.isf"),
                                     root=out, use_bvh=False)
    img_brute = np.asarray(
        render_pixel_sums(brute_scene, W, H, 1, SPP, spec,
                          samples_per_launch=SPP)) / SPP
    # Same counter RNG + same walk semantics: BVH vs brute differ only by
    # fp association inside MT.
    np.testing.assert_allclose(img_bvh, img_brute, rtol=1e-3, atol=2e-4)


def test_debug_aov_on_converted(converted, tmp_path):
    from path_tracer_tpu.config import Resolution
    from path_tracer_tpu.models.debug_aov import compute_aovs
    from path_tracer_tpu.scene import load_scene

    out, _ = converted
    scene = load_scene(out / "scene.isf")
    bufs = compute_aovs(scene, Resolution(48, 36))
    normal = np.asarray(bufs["normal"])
    # Terrain normals point mostly up: encoded 0.5*n+0.5, so the green
    # channel exceeds the 0.5 miss-encoding on average and some pixels are
    # strongly up-facing.
    assert normal[..., 1].mean() > 0.52
    assert normal[..., 1].max() > 0.9
    assert np.isfinite(np.asarray(bufs["albedo"])).all()
