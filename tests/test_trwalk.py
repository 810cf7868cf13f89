"""Fused in-kernel transparent walks (ops/pallas_trwalk.py) parity.

The kernels run in interpret mode on CPU (PT_TRWALK_INTERPRET=1); the
on-chip compiled gate lives in tests/tools/tpu_kernel_check.py (measured
BIT-EXACT against the XLA walks on the real chip — FMA-rounding texel-index
flips are possible in principle, so the gates here bound the divergence
rate instead of asserting exact equality).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront


@pytest.fixture(scope="module")
def tex_scene():
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    return showcase_device_scene(grid=48, textured=True)


def test_tables_built(tex_scene):
    s = tex_scene
    assert s.tr_kernel_ok and s.tr_textured
    n_tr = s.num_real_triangles - s.n_tris_opaque
    # Compact columns: exactly the real transparent triangles + 128-pad.
    assert s.tr_bw.shape[1] == ((n_tr + 127) // 128) * 128
    # colmap points into the transparent slot range and at real slots.
    cm = np.asarray(s.tr_colmap)[:n_tr]
    assert (cm >= s.sl_n_blocks_opaque * s.sl_block).all()
    sl_map = np.asarray(s.sl_map)
    assert (sl_map[cm] >= s.n_tris_opaque).all()
    # The u8 texture plane + LUT reproduce the atlas bit-for-bit.
    lut = np.asarray(s.tr_lut)[0]
    t8 = np.asarray(s.tr_tex8, np.float32)[: s.tr_texh, : s.tr_texw]
    tid = int(np.asarray(s.mat_opacity_tex).max())
    off = int(np.asarray(s.tex_offset)[tid])
    w, h = (int(np.asarray(s.tex_width)[tid]),
            int(np.asarray(s.tex_height)[tid]))
    plane = np.asarray(s.tex_data)[off : off + w * h, 0].reshape(h, w)
    assert np.array_equal(lut[t8.astype(np.int32)], plane)


def test_kernel_walk_matches_xla_walk(tex_scene, monkeypatch):
    """Full textured render through the in-kernel walks vs the XLA cast
    walks, same RNG: divergence-rate gate (a final-ulp uv difference can
    flip a texel index on boundary hits; anything systematic would move
    far more than 0.5% of pixels)."""
    from path_tracer_tpu.models import integrator as I

    W, H = 48, 32
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spec = IntegratorSpec(bounces=3, differentiable=False)
    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    assert I._use_tr_kernel(tex_scene, spec)
    a = np.asarray(render_wavefront(tex_scene, ids, W, H, jnp.int32(1),
                                    spec))
    monkeypatch.delenv("PT_TRWALK_INTERPRET")
    monkeypatch.setenv("PT_NO_TRWALK_KERNEL", "1")
    assert not I._use_tr_kernel(tex_scene, spec)
    b = np.asarray(render_wavefront(tex_scene, ids, W, H, jnp.int32(1),
                                    spec))
    d = np.abs(a - b)
    assert (d.max(axis=-1) > 1e-3).mean() < 0.005, d.max()
    assert d.mean() < 1e-5


def test_kernel_walk_residual_past_cap(tex_scene, monkeypatch):
    """A step cap of 1 forces nearly every multi-crossing lane through the
    cast residual: the walk outputs must still match the uncapped kernel
    walk. On CPU the residual cast uses Moller-Trumbore while the kernel
    uses Baldwin-Weber, so the t_prev handoff can re-order measure-zero
    near-tie hits — the gate is a per-lane flip-RATE bound (a TRUNCATING
    implementation would flip every multi-crossing lane; on TPU both paths
    are BW and the render parity gate in tpu_kernel_check is bit-exact)."""
    from path_tracer_tpu.models import integrator as I
    from path_tracer_tpu.ops import pallas_trwalk as twk

    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    s = tex_scene
    spec = IntegratorSpec(bounces=2, differentiable=False)
    rng = np.random.default_rng(1)
    r = 512
    lo = np.asarray(s.tri_v0[: s.num_real_triangles]).min(axis=0)
    hi = np.asarray(s.tri_v0[: s.num_real_triangles]).max(axis=0)
    o = jnp.asarray(rng.uniform(lo - 2, hi + 2, (r, 3)).astype(np.float32))
    tgt = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    dn = tgt - np.asarray(o)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
    d = jnp.asarray(dn)
    pix = jnp.arange(r, dtype=jnp.int32)
    walking = jnp.ones((r,), bool)
    steps = s.num_transparent_hits + 1

    def alpha(k):
        monkeypatch.setattr(twk, "TRWALK_K", k)
        return I._alpha_walk(s, o, d, walking, pix, jnp.int32(1),
                             jnp.int32(0), spec, steps)

    a, b = alpha(8), alpha(1)
    flips = (np.asarray(a[0].prim) != np.asarray(b[0].prim)).mean()
    assert flips <= 0.01, flips  # near-tie reorders only, never truncation
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))

    def shadow(k):
        monkeypatch.setattr(twk, "TRWALK_K", k)
        return np.asarray(I._shadow_attenuation(
            s, o, d, walking, jnp.ones((3,)), spec, steps))

    x, y = shadow(8), shadow(1)
    assert (np.abs(x - y).max(axis=-1) > 1e-5).mean() <= 0.01


def test_differentiable_mode_live_opacity_factor(tex_scene, monkeypatch):
    """Training mode: the kernel walks must read the LIVE opacity-factor
    table (a train step may dataclasses.replace it). Values through the
    kernel path with a replaced factor must match the XLA walk's."""
    import dataclasses

    W, H = 32, 24
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spec = IntegratorSpec(bounces=2)  # differentiable=True
    s2 = dataclasses.replace(
        tex_scene, mat_opacity_factor=tex_scene.mat_opacity_factor * 0.6)
    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    a = np.asarray(render_wavefront(s2, ids, W, H, jnp.int32(1), spec))
    monkeypatch.delenv("PT_TRWALK_INTERPRET")
    monkeypatch.setenv("PT_NO_TRWALK_KERNEL", "1")
    b = np.asarray(render_wavefront(s2, ids, W, H, jnp.int32(1), spec))
    d = np.abs(a - b)
    assert (d.max(axis=-1) > 1e-3).mean() < 0.005, d.max()
    # And the factor change actually mattered (the live row was read).
    monkeypatch.delenv("PT_NO_TRWALK_KERNEL")
    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    c = np.asarray(render_wavefront(tex_scene, ids, W, H, jnp.int32(1),
                                    spec))
    assert np.abs(a - c).max() > 1e-3


def test_differentiable_mode_gradients(tex_scene, monkeypatch):
    """jax.grad through the kernel-walk render path (walks detached; the
    shading gradient must match the XLA-walk path's)."""
    import dataclasses
    import jax

    W, H = 24, 16
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spec = IntegratorSpec(bounces=1, alpha_walk_steps=3,
                          shadow_walk_steps=3)

    def loss(f, env):
        s2 = dataclasses.replace(
            tex_scene, mat_albedo_factor=tex_scene.mat_albedo_factor * f)
        return jnp.mean(render_wavefront(s2, ids, W, H, jnp.int32(1), spec))

    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    g_kernel = float(jax.grad(loss)(jnp.float32(1.0), None))
    monkeypatch.delenv("PT_TRWALK_INTERPRET")
    monkeypatch.setenv("PT_NO_TRWALK_KERNEL", "1")
    g_xla = float(jax.grad(loss)(jnp.float32(1.0), None))
    assert np.isfinite(g_kernel) and abs(g_xla) > 1e-9
    assert abs(g_kernel - g_xla) <= 0.02 * abs(g_xla) + 1e-7


def test_factor_only_kernel_walk_matches_xla(monkeypatch):
    """The textured=False kernel path (no texel fetch, factor-only opacity)
    against the XLA walks — the showcase fixture is textured, so this is
    the only gate on the factor-only kernel branch. Uses the >32-cluster
    scene from test_partition (46 translucent quads + opaque floor)."""
    from tests.test_partition import many_cluster_scene as mk

    s = mk.__wrapped__()
    assert s.tr_kernel_ok and not s.tr_textured
    from path_tracer_tpu.models import integrator as I

    W, H = 64, 36
    ids = jnp.arange(W * H, dtype=jnp.int32)
    spec = IntegratorSpec(bounces=2, differentiable=False)
    monkeypatch.setenv("PT_TRWALK_INTERPRET", "1")
    assert I._use_tr_kernel(s, spec)
    a = np.asarray(render_wavefront(s, ids, W, H, jnp.int32(1), spec))
    monkeypatch.delenv("PT_TRWALK_INTERPRET")
    monkeypatch.setenv("PT_NO_TRWALK_KERNEL", "1")
    b = np.asarray(render_wavefront(s, ids, W, H, jnp.int32(1), spec))
    d = np.abs(a - b)
    assert (d.max(axis=-1) > 1e-3).mean() < 0.005, d.max()
    assert d.mean() < 1e-5
