"""Inverse rendering: recover scene albedos from a target image by gradient
descent — the differentiable-rendering workflow (BASELINE.md config #4).

The target is rendered INDEPENDENTLY of the fitting estimator (different RNG
seed, higher sample count), so the fit cannot "invert the crime" by matching
per-sample noise: the loss converges to the Monte-Carlo noise floor (not
zero) while the recovered albedos converge to the true values.

Usage: python examples/inverse_rendering.py [steps]
"""
import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.scene.procedural import cornell_device_scene

TARGET_SEED = 1234  # independent of the fit estimator's seed (0)
TARGET_SPP = 32
FIT_SPP = 4


def render_avg(scene, spec, ids, w, h, n_samples):
    def body(acc, k):
        return acc + render_wavefront(scene, ids, w, h, k + 1, spec), None

    acc, _ = jax.lax.scan(body, jnp.zeros((ids.shape[0], 3), jnp.float32),
                          jnp.arange(n_samples))
    return acc / n_samples


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    scene = cornell_device_scene()
    w = h = 24
    ids = jnp.arange(w * h, dtype=jnp.int32)

    # Independently rendered target: different seed, higher spp.
    target_spec = IntegratorSpec(bounces=1, alpha_walk_steps=2,
                                 shadow_walk_steps=2, tri_block=256,
                                 seed=TARGET_SEED, differentiable=False)
    target_albedo = scene.mat_albedo_factor
    target = jax.jit(render_avg, static_argnums=(1, 3, 4, 5))(
        scene, target_spec, ids, w, h, TARGET_SPP)

    fit_spec = IntegratorSpec(bounces=1, alpha_walk_steps=2,
                              shadow_walk_steps=2, tri_block=256, seed=0)

    def loss_fn(albedo, sample_start):
        s = dataclasses.replace(scene, mat_albedo_factor=albedo)

        def body(acc, k):
            img = render_wavefront(s, ids, w, h, sample_start + k, fit_spec)
            return acc + img, None

        acc, _ = jax.lax.scan(body, jnp.zeros_like(target),
                              jnp.arange(FIT_SPP))
        return jnp.mean((acc / FIT_SPP - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    albedo = jnp.clip(target_albedo * 0.4 + 0.2, 0.0, 1.0)  # wrong start
    for i in range(steps):
        # Fresh sample ids every step: stochastic gradient descent over the
        # estimator's sample stream, not repeated descent on one realization.
        loss, grad = vg(albedo, jnp.int32(1 + i * FIT_SPP))
        albedo = jnp.clip(albedo - 2.0 * grad, 0.0, 1.0)
        if i % 10 == 0:
            err = float(jnp.abs(albedo - target_albedo).max())
            print(f"step {i:3d}  loss {float(loss):.6f}  "
                  f"max albedo err {err:.4f}")
    err = float(jnp.abs(albedo - target_albedo).max())
    print(f"final max albedo err {err:.4f} (loss floor = MC noise, not 0)")
    print("recovered albedos:\n", albedo)


if __name__ == "__main__":
    main()
