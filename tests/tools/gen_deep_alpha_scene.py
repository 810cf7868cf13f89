"""Author the deep_alpha stress scene: 12 stacked translucent quads over an
opaque back wall, lit through the stack by a directional light.

The stack is deeper than the wavefront renderer's default alpha_walk_steps=8,
so it exercises (a) the bounded alpha re-cast walk against the reference's
walk-all-sorted-hits semantics (ref: src/renderer/mod.rs:188-205) and (b)
the multiplicative (1-opacity) shadow attenuation over many occluders
(mod.rs:283-299). Writes tests/scenes_extra/deep_alpha/scene.isf.
"""
from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "scenes_extra" / "deep_alpha"

N_QUADS = 12
OPACITY = 0.35


def vert(x, y, z, nz):
    return {"position": [x, y, z], "normal": [0.0, 0.0, nz],
            "tex_coords": [0.0, 0.0]}


def quad(z, half, nz=1.0):
    a, b, c, d = (vert(-half, -half, z, nz), vert(half, -half, z, nz),
                  vert(half, half, z, nz), vert(-half, half, z, nz))
    return [[a, b, c], [a, c, d]]


def main():
    models = []
    for k in range(N_QUADS):
        models.append({
            "type": "Mesh",
            "triangles": quad(10.0 - k, 6.0),
            "material": {
                "albedo": {"factor": [0.9, 0.9, 0.95], "texture": None},
                "opacity": {"factor": OPACITY, "texture": None},
                "roughness": {"factor": 1.0, "texture": None},
                "metalness": {"factor": 0.0, "texture": None},
                "normal_texture": None,
            },
        })
    models.append({
        "type": "Mesh",
        "triangles": quad(-5.0, 20.0),
        "material": {
            "albedo": {"factor": [0.8, 0.25, 0.2], "texture": None},
            "roughness": {"factor": 0.8, "texture": None},
            "metalness": {"factor": 0.0, "texture": None},
            "normal_texture": None,
        },
    })
    scene = {
        "models": models,
        # cgmath column-major: inner lists are columns; camera at z=25.
        "camera": {
            "transform": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                          [0, 0, 25, 1]],
            "fov": 0.7,
            "zfar": 100.0,
            "znear": 0.1,
        },
        "lights": [
            {"type": "Directional", "direction": [0.0, 0.0, -1.0],
             "color": [3.0, 3.0, 3.0]},
            {"type": "Point", "position": [8.0, 8.0, 14.0],
             "color": [400.0, 380.0, 360.0], "size": 0.1},
        ],
        "background": [0.05, 0.08, 0.2],
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "scene.isf").write_text(json.dumps(scene))
    print(f"wrote {OUT / 'scene.isf'} ({N_QUADS} quads @ opacity {OPACITY})")


if __name__ == "__main__":
    main()
