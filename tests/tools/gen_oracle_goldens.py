"""Generate frozen oracle goldens: reference-structure renders of the test
scenes by the independent scalar oracle (tests/oracle/reference_oracle.py).

Writes tests/goldens/oracle/<case>.npz with the mean pre-tonemap radiance
and the config, consumed by tests/test_oracle_parity.py. Regenerate with:

    python tests/tools/gen_oracle_goldens.py [case ...]

Cases cover all 7 reference scenes at converged spp plus a bounces=6 config
(Russian roulette actually fires: ref utils.rs:23-31 needs bounce>3) and a
deep alpha stack (more stacked translucent surfaces than the wavefront
renderer's default alpha_walk_steps).
"""
from __future__ import annotations

import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from tests.oracle.case_scenes import resolve_scene  # noqa: E402
from tests.oracle.reference_oracle import (  # noqa: E402
    load_oracle_scene, oracle_render)

OUT = REPO / "tests" / "goldens" / "oracle"

W, H = 64, 48

# case name -> (scene spec, spp, bounces[, width, height])
# A scene spec is a repo-relative path or an @tag materialized by
# tests/oracle/case_scenes.py (procedural: textured showcase, converted GLB).
CASES = {
    "cube": ("tests/scenes/cube/scene.isf", 64, 4),
    "reflection": ("tests/scenes/reflection/scene.isf", 64, 4),
    "spheres": ("tests/scenes/spheres/scene.isf", 64, 4),
    "head": ("tests/scenes/head/scene.isf", 64, 4),
    "alpha_transparency": ("tests/scenes/alpha_transparency/scene.isf", 64, 4),
    "white_furnace_direct": ("tests/scenes/white_furnace_direct/scene.isf",
                             64, 0),
    "white_furnace_indirect": ("tests/scenes/white_furnace_indirect/scene.isf",
                               64, 4),
    # Russian roulette exercised: bounces=6 makes bounce>3 iterations real.
    "cube_rr_b6": ("tests/scenes/cube/scene.isf", 128, 6),
    "spheres_rr_b6": ("tests/scenes/spheres/scene.isf", 64, 6),
    # 12 stacked translucent quads — deeper than alpha_walk_steps=8.
    "deep_alpha": ("tests/scenes_extra/deep_alpha/scene.isf", 128, 4),
    # The TEXTURED showcase (bench workload class): albedo/normal/roughness
    # textures + alpha-cutout foliage + emissive billboard, through the
    # opacity-partitioned walks.
    "showcase_tex": ("@showcase_tex_g64", 96, 4),
    # BASELINE.md graded config #3: glTF-CONVERTED mesh via BVH + alpha at
    # >=256^2 — kernel-block-boundary bugs cannot hide below 64x48.
    "glb_converted_256": ("@glb_converted", 24, 4, 256, 256),
    # ... and at the full 512^2 of BASELINE #3 (chip gate + CPU suite).
    "glb_converted_512": ("@glb_converted", 12, 4, 512, 512),
    # Multi-material GLB whose base-color textures carry TWO distinct alpha
    # patterns -> two converted opacity textures: the multi-page fused-walk
    # path on real converted content (VERDICT r4 next #8).
    "glb_multi_opacity": ("@glb_multi_opacity", 16, 4, 256, 256),
}


def _rows(args):
    scene_path, spp, bounces, w, h, rows = args
    scene = load_oracle_scene(scene_path)
    return oracle_render(scene, w, h, spp, bounces, rows=rows)


def generate(case: str, procs: int = 8):
    spec = CASES[case]
    scene_spec, spp, bounces = spec[0], spec[1], spec[2]
    w, h = (spec[3], spec[4]) if len(spec) > 3 else (W, H)
    scene_path = resolve_scene(scene_spec)
    t0 = time.time()
    chunks = [(str(scene_path), spp, bounces, w, h,
               list(range(r, h, procs))) for r in range(procs)]
    with ProcessPoolExecutor(max_workers=procs) as ex:
        parts = list(ex.map(_rows, chunks))
    img = np.sum(parts, axis=0)
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT / f"{case}.npz", radiance=img.astype(np.float32),
        width=w, height=h, spp=spp, bounces=bounces, scene=scene_spec)
    print(f"{case}: {time.time() - t0:.0f}s  mean={img.mean():.4f}")


if __name__ == "__main__":
    cases = sys.argv[1:] or list(CASES)
    for c in cases:
        generate(c)
