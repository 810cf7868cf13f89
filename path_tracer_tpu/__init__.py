"""path_tracer_tpu — a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/Pallas re-design of the capabilities of flomonster/path-tracer
(a Rust CPU path tracer). The compute path is wavefront-style SoA kernels under
``jax.jit`` (fixed shapes, bounded loops, counter-based RNG), scaled across TPU
chips with ``shard_map`` over a device mesh.

Layout (mirrors the reference's capability map, SURVEY.md §1, reference
``src/``):

- ``config``   — render profile (YAML) + resolution   (ref: src/config/)
- ``scene``    — ISF schema/loader, glTF converter, device SoA scene
                 (ref: src/scene/)
- ``ops``      — intersect/BRDF/tonemap/camera/RNG kernels
                 (ref: src/renderer/{ray,hit}.rs, brdf/, tonemap.rs)
- ``models``   — the wavefront path-tracing integrator + AOV debug renderer
                 (ref: src/renderer/mod.rs, debug_renderer.rs)
- ``parallel`` — device-mesh sharding, gradient psum, checkpointing
                 (ref analog: rayon par_iter, src/renderer/mod.rs:106)
- ``utils``    — image IO, progress, profiling
- ``viewer``   — progressive render viewer (ref: src/renderer/viewer.rs)
"""

__version__ = "0.1.0"

from path_tracer_tpu.config import Profile, Resolution  # noqa: F401


def load_scene(path):
    """Load an ISF scene into a device SoA scene (lazy import)."""
    from path_tracer_tpu.scene import load_scene as _load

    return _load(path)


def render(scene, profile=None, **kwargs):
    """Render a device scene → [H,W,3] uint8 (lazy import)."""
    from path_tracer_tpu.models.renderer import render as _render

    return _render(scene, profile or Profile(), **kwargs)
