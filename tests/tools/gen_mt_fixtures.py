"""Independent Python oracle that regenerates Möller-Trumbore fixtures.

Role parity with the reference's generator
(ref: tests/moller_trumbore/gen_tests.py:41-153): NUM_RAYS random rays
between points on the unit sphere x NUM_TRIANGLES random triangles in
[-1,1]^3, intersected by a scalar straight-from-the-paper MT implementation
(det cutoff 1e-6, dist >= 0), emitted as hit/miss YAML balanced by
truncating the miss list. The YAML schema is identical, so these fixtures
are interchangeable with the reference's checked-in ones (which
tests/test_moller_trumbore.py consumes directly).

Run: python tests/tools/gen_mt_fixtures.py [out_dir] [seed]
"""
from __future__ import annotations

import math
import random
import sys
from pathlib import Path

NUM_RAYS = 100
NUM_TRIANGLES = 400


def ray_triangle_intersect(orig, direction, v0, v1, v2):
    """Scalar MT oracle — deliberately independent of the JAX kernels."""

    def sub(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    e1 = sub(v1, v0)
    e2 = sub(v2, v0)
    pvec = cross(direction, e2)
    det = dot(e1, pvec)
    if abs(det) < 1e-6:
        return None
    invdet = 1.0 / det
    tvec = sub(orig, v0)
    u = dot(tvec, pvec) * invdet
    if u < 0 or u > 1:
        return None
    qvec = cross(tvec, e1)
    v = dot(direction, qvec) * invdet
    if v < 0 or u + v > 1:
        return None
    dist = dot(e2, qvec) * invdet
    if dist < 0:
        return None
    return dist, u, v


def random_sphere_point(rng):
    lat = math.acos(2 * rng.random() - 1) - math.pi / 2
    lon = 2 * math.pi * rng.random()
    return (math.cos(lat) * math.cos(lon),
            math.cos(lat) * math.sin(lon),
            math.sin(lat))


def generate(seed=None):
    rng = random.Random(seed)
    tris = [
        tuple(
            tuple(rng.random() * 2.0 - 1.0 for _ in range(3))
            for _ in range(3)
        )
        for _ in range(NUM_TRIANGLES)
    ]
    hits, misses = [], []
    for _ in range(NUM_RAYS):
        orig = random_sphere_point(rng)
        tgt = random_sphere_point(rng)
        d = (tgt[0] - orig[0], tgt[1] - orig[1], tgt[2] - orig[2])
        n = math.sqrt(sum(x * x for x in d))
        direction = (d[0] / n, d[1] / n, d[2] / n)
        for v0, v1, v2 in tris:
            case = {
                "triangle": {"v0": list(v0), "v1": list(v1), "v2": list(v2)},
                "ray": {"position": list(orig), "direction": list(direction)},
            }
            hit = ray_triangle_intersect(orig, direction, v0, v1, v2)
            if hit:
                case["hit"] = {"dist": hit[0], "u": hit[1], "v": hit[2]}
                hits.append(case)
            else:
                misses.append(case)
    return hits, misses[: len(hits)]  # balanced, like the reference


def main():
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(".")
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else None
    import yaml

    hits, misses = generate(seed)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "hit_tests.yml", "w") as f:
        print(f"Generate hit_tests.yml: {len(hits)} hits")
        yaml.safe_dump(hits, f)
    with open(out_dir / "miss_tests.yml", "w") as f:
        print(f"Generate miss_tests.yml: {len(misses)} misses")
        yaml.safe_dump(misses, f)


if __name__ == "__main__":
    main()
