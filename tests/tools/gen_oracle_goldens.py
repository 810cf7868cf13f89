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

from tests.oracle.reference_oracle import (  # noqa: E402
    load_oracle_scene, oracle_render)

SCENES = REPO / "tests" / "scenes"
EXTRA = REPO / "tests" / "scenes_extra"
OUT = REPO / "tests" / "goldens" / "oracle"

W, H = 64, 48

# case name -> (scene path, spp, bounces)
CASES = {
    "cube": (SCENES / "cube/scene.isf", 64, 4),
    "reflection": (SCENES / "reflection/scene.isf", 64, 4),
    "spheres": (SCENES / "spheres/scene.isf", 64, 4),
    "head": (SCENES / "head/scene.isf", 64, 4),
    "alpha_transparency": (SCENES / "alpha_transparency/scene.isf", 64, 4),
    "white_furnace_direct": (SCENES / "white_furnace_direct/scene.isf", 64,
                             0),
    "white_furnace_indirect": (SCENES / "white_furnace_indirect/scene.isf",
                               64, 4),
    # Russian roulette exercised: bounces=6 makes bounce>3 iterations real.
    "cube_rr_b6": (SCENES / "cube/scene.isf", 128, 6),
    "spheres_rr_b6": (SCENES / "spheres/scene.isf", 64, 6),
    # 12 stacked translucent quads — deeper than alpha_walk_steps=8.
    "deep_alpha": (EXTRA / "deep_alpha/scene.isf", 128, 4),
}


def _rows(args):
    scene_path, spp, bounces, rows = args
    scene = load_oracle_scene(scene_path)
    return oracle_render(scene, W, H, spp, bounces, rows=rows)


def generate(case: str, procs: int = 4):
    scene_path, spp, bounces = CASES[case]
    t0 = time.time()
    chunks = [(str(scene_path), spp, bounces, list(range(r, H, procs)))
              for r in range(procs)]
    with ProcessPoolExecutor(max_workers=procs) as ex:
        parts = list(ex.map(_rows, chunks))
    img = np.sum(parts, axis=0)
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT / f"{case}.npz", radiance=img.astype(np.float32),
        width=W, height=H, spp=spp, bounces=bounces,
        scene=str(scene_path.relative_to(REPO)))
    print(f"{case}: {time.time() - t0:.0f}s  mean={img.mean():.4f}")


if __name__ == "__main__":
    cases = sys.argv[1:] or list(CASES)
    for c in cases:
        generate(c)
