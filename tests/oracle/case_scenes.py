"""Resolve oracle-case scene specs to on-disk scene.isf paths.

A case's ``scene`` field is either a repo-relative path (the vendored
reference scenes) or an ``@tag`` for a PROCEDURALLY MATERIALIZED scene —
deterministic generators write scene.isf + textures into
tests/_generated/<tag>/ at first use, so no binary assets live in the repo
while goldens stay reproducible byte-for-byte (u8 PNG round-trip, fixed
seeds).

Tags:
- @showcase_tex_g64 — the textured showcase (terrain albedo/normal/rough
  textures, alpha-cutout foliage, emissive billboard) at grid=64, the
  bench workload's oracle-parity anchor.
- @glb_converted — the authored ~12k-tri GLB (tests/tools/gen_test_glb.py)
  run through the glTF->ISF converter: BASELINE.md graded config #3's
  "glTF-converted mesh via BVH + alpha" scene (textured terrain +
  translucent dome; >4096 tris so the BVH path auto-engages).
"""
from __future__ import annotations

from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
GENERATED = REPO / "tests" / "_generated"


def resolve_scene(spec: str) -> Path:
    if not spec.startswith("@"):
        return REPO / spec
    tag = spec[1:]
    out = GENERATED / tag
    marker = out / ".done"
    scene_path = out / "scene.isf"
    if marker.exists():
        return scene_path
    out.mkdir(parents=True, exist_ok=True)
    if tag == "showcase_tex_g64":
        import sys

        sys.path.insert(0, str(REPO))
        from path_tracer_tpu.scene.showcase import write_showcase_scene_dir

        write_showcase_scene_dir(out, grid=64, textured=True)
    elif tag in ("glb_converted", "glb_multi_opacity"):
        import sys

        sys.path.insert(0, str(REPO))
        sys.path.insert(0, str(REPO / "tests" / "tools"))
        from gen_test_glb import write_glb

        from path_tracer_tpu.scene.gltf import convert_gltf_to_isf

        glb = out / "scene.glb"
        write_glb(glb, multi_opacity=(tag == "glb_multi_opacity"))
        convert_gltf_to_isf(glb, out)
    else:
        raise ValueError(f"unknown generated-scene tag {spec!r}")
    marker.touch()
    return scene_path
