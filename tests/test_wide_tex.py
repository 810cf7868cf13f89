"""Wide-texel table invariants (device_scene._build_wide_tex) and sampler
equivalence (ops/texturing wide path).

The wide table interleaves every channel's texels per material so one row
gather serves all covered channels; its values MUST be bit-identical to the
per-channel atlas fetches it replaces (the samplers switch on the static
wide_covered flags, so a mismatch would silently shade wrong).
"""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from path_tracer_tpu.ops import texturing as TX
from path_tracer_tpu.scene.device_scene import (
    ATTR_WIDE_G, WIDE_COLS, WIDE_NORMAL, WIDE_OPACITY, WIDE_ROUGH)


@pytest.fixture(scope="module")
def tex_scene():
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    return showcase_device_scene(grid=48, textured=True)


def test_build_invariants(tex_scene):
    s = tex_scene
    # The showcase mixes sizes on purpose (1024^2 albedo next to 512^2
    # normal+rough): the primary-size group covers everything except the
    # odd-size albedo.
    assert s.wide_covered == (False, True, True, False, True, True)
    assert s.tex_wide.shape[1] == WIDE_COLS
    attr = np.asarray(s.sl_attr)
    woff = attr[:, ATTR_WIDE_G].astype(np.int64)
    ww = attr[:, ATTR_WIDE_G + 1].astype(np.int64)
    wh = attr[:, ATTR_WIDE_G + 2].astype(np.int64)
    # Offsets stay inside the table for every row's full block.
    assert (woff >= 0).all()
    assert (woff + ww * wh <= s.tex_wide.shape[0]).all()
    # Offsets and sizes are integers representable exactly in f32.
    assert (attr[:, ATTR_WIDE_G] == woff).all()


def test_wide_texels_match_per_channel_fetch(tex_scene):
    """For covered channels, the wide gather returns the SAME texel values
    as the per-channel table-fetch path at identical uv (bit-exact)."""
    s = tex_scene
    rng = np.random.default_rng(7)
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (512, 2)).astype(np.float32))
    n_rows = s.sl_attr.shape[0]
    rows = s.sl_attr[jnp.asarray(
        rng.integers(0, n_rows, 512, dtype=np.int64))]

    texw = np.asarray(TX._wide_texels(s, rows, uv))
    from path_tracer_tpu.scene.device_scene import (
        ATTR_NORMAL_G, ATTR_NORMAL_T, ATTR_OPACITY_G, ATTR_OPACITY_T,
        ATTR_ROUGH_G, ATTR_ROUGH_T)

    for wc, tcol, gcol in ((WIDE_OPACITY, ATTR_OPACITY_T, ATTR_OPACITY_G),
                           (WIDE_ROUGH, ATTR_ROUGH_T, ATTR_ROUGH_G)):
        ref = np.asarray(TX._rows_texel(s, rows, tcol, gcol, uv))
        tid = np.asarray(rows[:, tcol]).astype(np.int32)
        # Only rows whose channel is textured AND whose texture rides the
        # wide block (same (w,h) as the wide geometry) must match.
        w = np.asarray(s.tex_width)[np.maximum(tid, 0)]
        h = np.asarray(s.tex_height)[np.maximum(tid, 0)]
        mask = (tid >= 0) & (w == np.asarray(rows[:, ATTR_WIDE_G + 1])) \
            & (h == np.asarray(rows[:, ATTR_WIDE_G + 2]))
        assert mask.any()
        np.testing.assert_array_equal(texw[mask, wc], ref[mask, 0])
    # Normal (rgb channel).
    refn = np.asarray(TX._rows_texel(s, rows, ATTR_NORMAL_T, ATTR_NORMAL_G,
                                     uv))
    tid = np.asarray(rows[:, ATTR_NORMAL_T]).astype(np.int32)
    w = np.asarray(s.tex_width)[np.maximum(tid, 0)]
    mask = (tid >= 0) & (w == np.asarray(rows[:, ATTR_WIDE_G + 1]))
    assert mask.any()
    np.testing.assert_array_equal(
        texw[mask, WIDE_NORMAL:WIDE_NORMAL + 3], refn[mask])


def test_sample_material_identical_with_wide_disabled(tex_scene):
    """sample_material through the wide path == with wide_covered forced
    off (the per-channel fetch path), bit for bit."""
    s = tex_scene
    rng = np.random.default_rng(11)
    uv = jnp.asarray(rng.uniform(0, 1, (512, 2)).astype(np.float32))
    rows = s.sl_attr[jnp.asarray(
        rng.integers(0, s.sl_attr.shape[0], 512, dtype=np.int64))]
    model = rows[:, 27].astype(jnp.int32)
    simple = jnp.zeros((512,), bool)
    a = TX.sample_material(s, model, uv, simple, rows=rows)
    s_off = dataclasses.replace(s, wide_covered=(False,) * 6)
    b = TX.sample_material(s_off, model, uv, simple, rows=rows)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    na, _ = TX.sample_normal_map(s, model, uv, rows=rows)
    nb, _ = TX.sample_normal_map(s_off, model, uv, rows=rows)
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
