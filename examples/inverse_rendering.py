"""Inverse rendering: recover scene albedos from a target image by gradient
descent — the differentiable-rendering workflow (BASELINE.md config #4).

Usage: python examples/inverse_rendering.py [steps]
"""
import sys

import jax
import jax.numpy as jnp

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.scene.procedural import cornell_device_scene


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    scene = cornell_device_scene()
    spec = IntegratorSpec(bounces=1, alpha_walk_steps=2, shadow_walk_steps=2,
                          tri_block=256)
    w = h = 24
    ids = jnp.arange(w * h, dtype=jnp.int32)

    target_albedo = scene.mat_albedo_factor
    target = render_wavefront(scene, ids, w, h, jnp.int32(1), spec)

    import dataclasses

    def loss_fn(albedo):
        s = dataclasses.replace(scene, mat_albedo_factor=albedo)
        img = render_wavefront(s, ids, w, h, jnp.int32(1), spec)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    albedo = jnp.clip(target_albedo * 0.4 + 0.2, 0.0, 1.0)  # wrong start
    for i in range(steps):
        loss, grad = vg(albedo)
        albedo = jnp.clip(albedo - 2.0 * grad, 0.0, 1.0)
        if i % 10 == 0:
            err = float(jnp.abs(albedo - target_albedo).max())
            print(f"step {i:3d}  loss {float(loss):.6f}  max albedo err {err:.4f}")
    print("recovered albedos:\n", albedo)


if __name__ == "__main__":
    main()
