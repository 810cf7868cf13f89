"""Fused shadow kernel (ops/pallas_shadow.py) parity.

The fused kernel runs the opaque any-hit AND the transparent transmittance
walk for all lights in one launch; both halves call the SAME shared tile
functions as the two-launch path (pallas_bvh.flat_occ_set,
pallas_trwalk.trans_tile), so the kernels are value-identical. The
surrounding XLA glue (att0 * trans_eff vs the where(blocked) form) fuses
differently, which moves a few percent of pixels by ONE ULP — the gates
are a 1-ulp allclose, not hash equality. Kernels run in interpret mode on
CPU (PT_TRWALK_INTERPRET=1); the compiled on-chip gate rides
tpu_kernel_check/tpu_oracle_check (bench preamble).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.models import integrator as I


@pytest.fixture(scope="module")
def tex_scene():
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    # 48 spheres included: the XLA sphere-occlusion tail of the fused path
    # (ops.intersect.occluded_multi's quadratic) is part of the equality.
    return showcase_device_scene(grid=48, textured=True)


def _render(s, spec, monkeypatch, fused: bool, W=48, H=32):
    ids = jnp.arange(W * H, dtype=jnp.int32)
    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    if fused:
        monkeypatch.setenv("PT_FUSED_SHADOW", "1")  # opt-in (see gate doc)
        assert I._use_fused_shadow(s, spec)
    out = np.asarray(render_wavefront(s, ids, W, H, jnp.int32(1), spec))
    monkeypatch.delenv("PT_TRWALK_INTERPRET")
    monkeypatch.delenv("PT_FUSED_SHADOW", raising=False)
    return out


def test_fused_matches_two_launch_forward(tex_scene, monkeypatch):
    spec = IntegratorSpec(bounces=3, differentiable=False)
    a = _render(tex_scene, spec, monkeypatch, fused=True)
    b = _render(tex_scene, spec, monkeypatch, fused=False)
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=1e-7)


def test_fused_matches_two_launch_training_mode(tex_scene, monkeypatch):
    """differentiable=True: live factor row + live texture plane ride the
    fused launch identically."""
    spec = IntegratorSpec(bounces=2)  # differentiable=True
    a = _render(tex_scene, spec, monkeypatch, fused=True, W=32, H=24)
    b = _render(tex_scene, spec, monkeypatch, fused=False, W=32, H=24)
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=1e-7)


def test_fused_multi_page(monkeypatch):
    """Two-opacity-texture scene through the fused kernel (multi-page
    texel fetch inside the fused launch)."""
    from tests.test_trwalk import two_tex_scene

    class _F:
        def mktemp(self, name):
            import pathlib
            import tempfile

            return pathlib.Path(tempfile.mkdtemp())

    s = two_tex_scene.__wrapped__(_F())
    assert len(s.tr_pages) == 2
    spec = IntegratorSpec(bounces=2, differentiable=False)
    a = _render(s, spec, monkeypatch, fused=True)
    b = _render(s, spec, monkeypatch, fused=False)
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=1e-7)


def test_fused_residual_past_cap(tex_scene, monkeypatch):
    """A step cap of 1 forces deep lanes through the stacked cast residual
    — the fused path's residual must reproduce the two-launch path's
    (both run the same cast walk outside their kernels)."""
    from path_tracer_tpu.ops import pallas_trwalk as twk

    monkeypatch.setattr(twk, "TRWALK_K", 1)
    spec = IntegratorSpec(bounces=2, differentiable=False)
    a = _render(tex_scene, spec, monkeypatch, fused=True, W=32, H=24)
    b = _render(tex_scene, spec, monkeypatch, fused=False, W=32, H=24)
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=1e-7)


def test_single_light_uses_fused(monkeypatch):
    """n_lights == 1 routes through the fused path too (the two-launch
    path only batched multi-light bounces)."""
    import dataclasses

    from path_tracer_tpu.scene.showcase import showcase_device_scene

    s = showcase_device_scene(grid=48, textured=True)
    zero3 = jnp.zeros((0, 3), jnp.float32)
    s1 = dataclasses.replace(s, point_pos=zero3, point_color=zero3)
    assert s1.num_dir_lights == 1 and s1.num_point_lights == 0
    spec = IntegratorSpec(bounces=2, differentiable=False)
    a = _render(s1, spec, monkeypatch, fused=True, W=32, H=24)
    b = _render(s1, spec, monkeypatch, fused=False, W=32, H=24)
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=1e-7)
