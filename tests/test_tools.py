"""Tests for the aux tooling: MT fixture generator and OBJ ray logger."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent / "tools"))


def test_generated_fixtures_pass_kernel(tmp_path):
    """Freshly generated oracle fixtures must agree with the JAX kernel at
    the reference's 1e-5 tolerance (same gate as the checked-in fixtures)."""
    from gen_mt_fixtures import generate

    from path_tracer_tpu.ops.intersect import moller_trumbore

    hits, misses = generate(seed=42)
    assert len(hits) > 500 and len(misses) == len(hits)

    def run(cases):
        o = jnp.asarray([c["ray"]["position"] for c in cases], jnp.float32)
        d = jnp.asarray([c["ray"]["direction"] for c in cases], jnp.float32)
        v0 = np.asarray([c["triangle"]["v0"] for c in cases], np.float32)
        v1 = np.asarray([c["triangle"]["v1"] for c in cases], np.float32)
        v2 = np.asarray([c["triangle"]["v2"] for c in cases], np.float32)
        n = o.shape[0]
        import jax

        def one(o_, d_, v0_, e1_, e2_):
            t, u, v, back, valid = moller_trumbore(
                o_[None], d_[None], v0_[None], e1_[None], e2_[None],
                jnp.asarray([-1.0]))
            return t[0, 0], u[0, 0], v[0, 0], valid[0, 0]

        return jax.vmap(one)(o, d, jnp.asarray(v0), jnp.asarray(v1 - v0),
                             jnp.asarray(v2 - v0))

    t, u, v, valid = run(hits)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(t),
                               [c["hit"]["dist"] for c in hits], atol=1e-5)
    np.testing.assert_allclose(np.asarray(u),
                               [c["hit"]["u"] for c in hits], atol=1e-5)

    _, _, _, valid = run(misses)
    assert not np.asarray(valid).any()


def test_obj_logger(tmp_path):
    from path_tracer_tpu.utils.obj_logger import ObjRayLogger, dump_camera_rays

    log = ObjRayLogger()
    log.ray((0, 0, 0), (0, 0, -1), length=2.0)
    log.line((1, 1, 1), (2, 2, 2))
    out = tmp_path / "rays.obj"
    log.write(out)
    text = out.read_text().splitlines()
    assert text[0] == "v 0.0 0.0 0.0"
    assert text[1] == "v 0.0 0.0 -2.0"
    assert "l 1 2" in text and "l 3 4" in text

    from path_tracer_tpu.scene.procedural import cornell_device_scene

    dump_camera_rays(cornell_device_scene(), 8, 8, tmp_path / "cam.obj",
                     stride=4)
    lines = (tmp_path / "cam.obj").read_text().splitlines()
    assert sum(1 for ln in lines if ln.startswith("l ")) == 16
