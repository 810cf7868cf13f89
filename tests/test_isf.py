"""Scene layer tests: ISF parsing, serde-default parity, device SoA build."""
import numpy as np
import pytest

from path_tracer_tpu.scene import isf, load_scene

ALL_SCENES = [
    "cube",
    "spheres",
    "reflection",
    "head",
    "alpha_transparency",
    "white_furnace_direct",
    "white_furnace_indirect",
]


def test_material_serde_defaults():
    """Parity with serde defaults (ref src/scene/isf.rs:77-142): whole-field-
    missing vs object-present-without-factor differ for emissive/metalness."""
    m = isf._material({"albedo": {}})
    assert m.albedo.factor == (1.0, 1.0, 1.0)
    assert m.emissive.factor == (0.0, 0.0, 0.0)  # derived Default
    assert m.opacity.factor == 1.0
    assert m.metalness.factor == 0.0  # derived Default (f32 zero!)
    assert m.roughness.factor == 1.0
    assert m.ior == 1.0
    assert m.normal_texture is None

    m2 = isf._material(
        {"albedo": {}, "emissive": {}, "metalness": {}, "opacity": {}, "roughness": {}}
    )
    assert m2.emissive.factor == (1.0, 1.0, 1.0)  # serde default fn "one"
    assert m2.metalness.factor == 1.0  # One::one
    assert m2.opacity.factor == 1.0
    assert m2.roughness.factor == 1.0


@pytest.mark.parametrize("name", ALL_SCENES)
def test_load_all_reference_scenes(reference_scenes, name):
    scene = load_scene(reference_scenes / name / "scene.isf")
    assert scene.tri_v0.shape[0] % 256 == 0
    assert scene.mat_albedo_factor.shape[0] >= 1
    # camera transform transposed to row-major: translation is column 3
    assert scene.cam_to_world.shape == (4, 4)


def test_cube_scene_contents(reference_scenes):
    raw = isf.load(reference_scenes / "cube" / "scene.isf")
    n_tris = sum(len(m.triangles) for m in raw.models if isinstance(m, isf.Mesh))
    assert n_tris == 12
    scene = load_scene(reference_scenes / "cube" / "scene.isf")
    assert scene.num_point_lights + scene.num_dir_lights == len(raw.lights)
    # padding triangles are degenerate (zero edges)
    np.testing.assert_array_equal(np.asarray(scene.tri_e1[n_tris:]), 0.0)


def test_spheres_scene_contents(reference_scenes):
    scene = load_scene(reference_scenes / "spheres" / "scene.isf")
    raw = isf.load(reference_scenes / "spheres" / "scene.isf")
    n_spheres = sum(1 for m in raw.models if isinstance(m, isf.Sphere))
    assert n_spheres == 25
    assert scene.sph_radius.shape[0] >= n_spheres
    assert np.all(np.asarray(scene.sph_radius[:n_spheres]) > 0)


def test_head_scene_textures(reference_scenes):
    scene = load_scene(reference_scenes / "head" / "scene.isf")
    # head has a 1024^2 albedo texture + gray alpha texture
    assert scene.tex_data.shape[0] > 1024 * 1024
    assert int(np.max(np.asarray(scene.mat_albedo_tex))) >= 1
    assert int(np.max(np.asarray(scene.mat_opacity_tex))) >= 1


def test_isf_roundtrip(tmp_path, reference_scenes):
    raw = isf.load(reference_scenes / "cube" / "scene.isf")
    isf.save(raw, tmp_path / "scene.isf")
    again = isf.load(tmp_path / "scene.isf")
    assert len(again.models) == len(raw.models)
    assert again.background == raw.background
    first = raw.models[0].triangles[0][0].position
    assert again.models[0].triangles[0][0].position == pytest.approx(first)
