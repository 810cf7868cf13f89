"""glTF→ISF converter tests: a synthetic GLB round-trips through the
converter and renders, with reference-parity texture naming and material
mapping (ref: src/scene/gltf.rs)."""
import base64
import json
import struct

import numpy as np
import pytest


def _build_gltf(tmp_path, binary=False):
    """Two-triangle quad + perspective camera + point & directional lights +
    textured material, buffers embedded."""
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    normals = np.array([[0, 0, 1]] * 4, np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    blob = positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    pad = (4 - len(blob) % 4) % 4
    blob += b"\x00" * pad

    # 2x2 checker texture PNG
    from PIL import Image
    import io

    tex = np.zeros((2, 2, 4), np.uint8)
    tex[0, 0] = [255, 0, 0, 255]
    tex[1, 1] = [0, 255, 0, 128]
    tex[0, 1] = tex[1, 0] = [255, 255, 255, 255]
    buf = io.BytesIO()
    Image.fromarray(tex, "RGBA").save(buf, format="PNG")
    png_bytes = buf.getvalue()

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2, 3]}],
        "nodes": [
            {"mesh": 0},
            {"camera": 0, "translation": [0, 0, 5]},
            {
                "extensions": {"KHR_lights_punctual": {"light": 0}},
                "translation": [0, 3, 3],
            },
            {"extensions": {"KHR_lights_punctual": {"light": 1}}},
        ],
        "extensions": {
            "KHR_lights_punctual": {
                "lights": [
                    {"type": "point", "color": [1, 0.5, 1], "intensity": 50},
                    {"type": "directional", "color": [1, 1, 1], "intensity": 2},
                ]
            }
        },
        "extensionsUsed": ["KHR_lights_punctual"],
        "cameras": [
            {
                "type": "perspective",
                "perspective": {"yfov": 0.8, "znear": 0.01, "zfar": 50.0},
            }
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.9, 0.8, 0.7, 0.6],
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.3,
                    "roughnessFactor": 0.4,
                },
                "emissiveFactor": [0.1, 0.2, 0.3],
            }
        ],
        "textures": [{"source": 0}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(blob)}],
        "images": [{"uri": "data:image/png;base64,"
                           + base64.b64encode(png_bytes).decode()}],
    }

    if binary:
        doc_bytes = json.dumps(doc).encode()
        doc_bytes += b" " * ((4 - len(doc_bytes) % 4) % 4)
        glb = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(doc_bytes) + 8 + len(blob))
        glb += struct.pack("<II", len(doc_bytes), 0x4E4F534A) + doc_bytes
        glb += struct.pack("<II", len(blob), 0x004E4942) + blob
        path = tmp_path / "scene.glb"
        path.write_bytes(glb)
    else:
        doc["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
        )
        path = tmp_path / "scene.gltf"
        path.write_text(json.dumps(doc))
    return path


@pytest.mark.parametrize("binary", [False, True])
def test_convert_roundtrip(tmp_path, binary):
    from path_tracer_tpu.scene import isf, load_scene
    from path_tracer_tpu.scene.gltf import convert_gltf_to_isf

    src = _build_gltf(tmp_path, binary=binary)
    out = tmp_path / "out"
    convert_gltf_to_isf(src, out)

    assert (out / "scene.isf").exists()
    # Reference texture naming: albedo + alpha split from baseColorTexture.
    assert (out / "albedo_tex_0.png").exists()
    assert (out / "alpha_tex_0.png").exists()

    scene = isf.load(out / "scene.isf")
    assert len(scene.models) == 1
    mesh = scene.models[0]
    assert len(mesh.triangles) == 2
    mat = mesh.material
    assert mat.albedo.factor == pytest.approx((0.9, 0.8, 0.7))
    assert mat.opacity.factor == pytest.approx(0.6)
    assert mat.metalness.factor == pytest.approx(0.3)
    assert mat.roughness.factor == pytest.approx(0.4)
    assert mat.emissive.factor == pytest.approx((0.1, 0.2, 0.3))
    assert mat.ior == 1.0
    assert mat.albedo.texture == "albedo_tex_0.png"
    assert mat.opacity.texture == "alpha_tex_0.png"

    lights = scene.lights
    assert isinstance(lights[0], isf.PointLight)
    assert lights[0].position == pytest.approx((0.0, 3.0, 3.0))
    assert lights[0].color == pytest.approx((50.0, 25.0, 50.0))
    assert lights[0].size == 0.1
    assert isinstance(lights[1], isf.DirectionalLight)
    assert lights[1].direction == pytest.approx((0.0, 0.0, -1.0))
    assert lights[1].color == pytest.approx((2.0, 2.0, 2.0))

    assert scene.camera.fov == pytest.approx(0.8)
    # Column-major: translation lives in transform[3] (ref camera.rs:42-48).
    assert scene.camera.transform[3][:3] == pytest.approx([0.0, 0.0, 5.0])
    assert scene.background == pytest.approx((0.0, 0.0, 0.0))

    # The converted scene loads into a device scene and renders.
    device = load_scene(out / "scene.isf")
    assert device.num_triangles >= 2

    from path_tracer_tpu.config import Profile, Resolution
    from path_tracer_tpu.models.renderer import render

    img = render(device, Profile(resolution=Resolution(8, 8), samples=1,
                                 bounces=1))
    assert img.shape == (8, 8, 3)


def test_convert_errors(tmp_path):
    from path_tracer_tpu.scene.gltf import convert_gltf_to_isf

    empty = tmp_path / "empty.gltf"
    empty.write_text(json.dumps({"asset": {"version": "2.0"}}))
    with pytest.raises(ValueError, match="No scenes"):
        convert_gltf_to_isf(empty, tmp_path / "o1")

    no_cam = tmp_path / "nocam.gltf"
    no_cam.write_text(json.dumps({
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": []}], "nodes": [],
    }))
    with pytest.raises(ValueError, match="No camera"):
        convert_gltf_to_isf(no_cam, tmp_path / "o2")


def test_convert_via_cli(tmp_path):
    """The `convert` subcommand end-to-end (ref: main.rs:54, run_convert)."""
    from path_tracer_tpu import cli

    src = _build_gltf(tmp_path, binary=True)
    out = tmp_path / "cli_out"
    cli.main(["convert", str(src), str(out)])
    assert (out / "scene.isf").exists()

    # Error path prints to stderr and exits 2 (ref main.rs:17-21).
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        cli.main(["convert", str(tmp_path / "missing.glb"), str(out)])
    assert exc.value.code == 2
