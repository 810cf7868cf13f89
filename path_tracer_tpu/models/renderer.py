"""Render driver: tiles x samples host loop around the jitted wavefront.

Plays the role of Renderer::render (ref: src/renderer/mod.rs:76-169): an
accumulation buffer over pixels, one pass per sample, then post-processing
(tonemap + gamma + u8). The rayon par_iter over pixels (mod.rs:106) becomes a
flat pixel-id wavefront; tiles bound device memory for the O(rays x tris)
brute-force path and become the sharding unit across chips.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.config import Profile
from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.ops import tonemap as tm


def integrator_spec(profile: Profile) -> IntegratorSpec:
    return IntegratorSpec(
        bounces=profile.bounces,
        alpha_walk_steps=profile.alpha_walk_steps,
        shadow_walk_steps=profile.shadow_walk_steps,
        seed=profile.seed,
    )


@partial(jax.jit, static_argnames=("width", "height", "n_samples", "spec"))
def _render_tile_batch(scene, pixel_ids, width, height, sample_start, n_samples,
                       spec):
    """Accumulate n_samples successive samples for one tile. [R,3] sum."""

    def body(carry, k):
        acc = carry
        rad = render_wavefront(scene, pixel_ids, width, height,
                               sample_start + k, spec)
        return acc + rad, None

    init = jnp.zeros((pixel_ids.shape[0], 3), jnp.float32)
    acc, _ = jax.lax.scan(body, init, jnp.arange(n_samples))
    return acc


def render_pixel_sums(scene, width: int, height: int, sample_start: int,
                      n_samples: int, spec: IntegratorSpec,
                      tile_rays: int = 1 << 16,
                      samples_per_launch: int = 1) -> np.ndarray:
    """Radiance sums [W*H, 3] over n_samples consecutive sample ids.

    The tiles x sample-batches launch loop without post-processing — used by
    the renderer, the benchmark, and checkpointed renders.
    """
    n_pix = width * height
    tile = min(tile_rays, max(1, n_pix))
    n_tiles = (n_pix + tile - 1) // tile
    spl = max(1, samples_per_launch)

    accum = np.zeros((n_tiles * tile, 3), np.float32)
    all_ids = np.arange(n_tiles * tile, dtype=np.int32)
    all_ids[n_pix:] = 0

    sample = sample_start
    end = sample_start + n_samples
    while sample < end:
        k = min(spl, end - sample)
        for ti in range(n_tiles):
            ids = jnp.asarray(all_ids[ti * tile : (ti + 1) * tile])
            acc = _render_tile_batch(scene, ids, width, height,
                                     jnp.int32(sample), k, spec)
            accum[ti * tile : (ti + 1) * tile] += np.asarray(acc)
        sample += k
    return accum[:n_pix]


def render(scene, profile: Profile, progress: bool = False,
           viewer=None) -> np.ndarray:
    """Render a scene → [H,W,3] uint8. Accumulates radiance over
    profile.samples (sample ids run 1..=samples as in ref mod.rs:105)."""
    width, height = profile.resolution.width, profile.resolution.height
    n_pix = width * height
    spec = integrator_spec(profile)

    tile = min(profile.tile_rays, max(1, n_pix))
    n_tiles = (n_pix + tile - 1) // tile
    spl = max(1, profile.samples_per_launch)

    accum = np.zeros((n_tiles * tile, 3), np.float32)
    all_ids = np.arange(n_tiles * tile, dtype=np.int32)
    all_ids[n_pix:] = 0  # padded lanes re-render pixel 0; discarded below

    t0 = time.time()
    bar = _ProgressBar(profile.samples, enabled=progress)
    sample = 1
    while sample <= profile.samples:
        k = min(spl, profile.samples - sample + 1)
        for ti in range(n_tiles):
            ids = jnp.asarray(all_ids[ti * tile : (ti + 1) * tile])
            acc = _render_tile_batch(scene, ids, width, height,
                                     jnp.int32(sample), k, spec)
            accum[ti * tile : (ti + 1) * tile] += np.asarray(acc)
        if viewer is not None:
            viewer.update(_finalize(accum[:n_pix], sample + k - 1, profile,
                                    width, height))
        bar.advance(k)
        sample += k

    elapsed = time.time() - t0
    bar.finish(f"Done: {elapsed:.1f}s")
    image = _finalize(accum[:n_pix], profile.samples, profile, width, height)
    return image


def _finalize(accum: np.ndarray, samples: int, profile: Profile, width, height):
    mean = jnp.asarray(accum) / float(samples)
    post = tm.post_process(profile.tonemap, mean)
    u8 = np.asarray(tm.to_u8(post))
    return u8.reshape(height, width, 3)


class _ProgressBar:
    """Per-sample progress line (ref: pbr bar, mod.rs:84-91,144-146)."""

    def __init__(self, total: int, enabled: bool):
        self.total = total
        self.done = 0
        self.enabled = enabled
        self.t0 = time.time()
        if enabled:
            self._draw()

    def _draw(self):
        frac = self.done / max(1, self.total)
        n = int(frac * 40)
        print(f"\rRendering: [{'#' * n}{'-' * (40 - n)}] "
              f"{self.done}/{self.total} ({time.time() - self.t0:.0f}s)",
              end="", flush=True)

    def advance(self, k=1):
        self.done += k
        if self.enabled:
            self._draw()

    def finish(self, msg: str):
        if self.enabled:
            print(f"\r{msg}{' ' * 60}")
