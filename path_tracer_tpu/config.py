"""Render profile and resolution config.

Reference parity: src/config/profile.rs:12-40 (YAML profile with defaults
1920x1080, bounces=4, samples=64, brdf=COOK_TORRANCE, tonemap=FILMIC) and
src/config/resolution.rs:4-16.

TPU-specific additions (not in the reference): wavefront knobs that bound the
fixed-shape loops replacing the reference's variable-length hit lists
(src/renderer/utils.rs:11-21) — ``alpha_walk_steps`` for the stochastic alpha
transparency walk (src/renderer/mod.rs:188-205) and ``shadow_walk_steps`` for
opacity-attenuated shadow rays (src/renderer/mod.rs:291-329); plus
``tile_rays``, the number of rays processed per jitted wavefront launch.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Union

import yaml

BRDF_TYPES = ("COOK_TORRANCE",)
TONEMAP_TYPES = ("REINHARD", "FILMIC", "ACES")


@dataclasses.dataclass(frozen=True)
class Resolution:
    width: int = 1920
    height: int = 1080

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class Profile:
    resolution: Resolution = Resolution()
    bounces: int = 4
    samples: int = 64
    brdf: str = "COOK_TORRANCE"
    tonemap: str = "FILMIC"
    # --- TPU wavefront knobs (beyond the reference) ---
    # Max closest-hit re-casts when walking stochastic alpha hits per bounce.
    # None (default) = auto: the scene's transparent-hit count + 1, which
    # makes the bounded walk EXACTLY equivalent to the reference's unbounded
    # sorted-hit iteration (mod.rs:188-205) — the while_loop early-exits, so
    # a large bound costs nothing at runtime. An explicit int truncates.
    alpha_walk_steps: int | None = None
    # Max occluder re-casts when accumulating shadow opacity attenuation.
    # Same auto semantics as alpha_walk_steps (ref mod.rs:283-331).
    shadow_walk_steps: int | None = None
    # Rays per jitted wavefront launch (pixel tile size, flattened).
    # 2^18 re-measured as a safe near-optimum in round 4 (the walk-kernel
    # paths amortize per-launch fixed costs over the wavefront; bench.py
    # uses 2^19 on the showcase class, but 2^18 is the conservative
    # default for arbitrary scene/memory mixes). Values are tile-size
    # invariant — only throughput changes. MEMORY: per-launch wavefront
    # state scales linearly with this (the r4 bump from 2^16 quadrupled
    # it, ADVICE r4); lower it on small/shared devices if a launch OOMs.
    tile_rays: int = 1 << 18
    # Samples accumulated per launch (inner sample batch).
    samples_per_launch: int = 1
    # Sample copies packed per kernel packet (shrinks the packet's screen
    # footprint and BVH block union by this factor; measured ~neutral on
    # the showcase, PERF.md — off by default; single-device only).
    samples_per_wavefront: int = 1
    # RNG seed (the reference derives streams from (pixel, sample) only,
    # src/renderer/mod.rs:110-112; we additionally mix a seed).
    seed: int = 0

    def __post_init__(self):
        if self.brdf not in BRDF_TYPES:
            raise ValueError(f"unknown brdf {self.brdf!r}, expected one of {BRDF_TYPES}")
        if self.tonemap not in TONEMAP_TYPES:
            raise ValueError(
                f"unknown tonemap {self.tonemap!r}, expected one of {TONEMAP_TYPES}"
            )

    @staticmethod
    def load(path: Union[str, Path]) -> "Profile":
        """Load a YAML render profile (ref: src/config/profile.rs:28-32).

        Accepts the reference's YAML schema::

            resolution: {width: 800, height: 600}
            bounces: 4
            samples: 16
            brdf: COOK_TORRANCE
            tonemap: FILMIC
        """
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return Profile.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "Profile":
        kwargs = {}
        if "resolution" in raw:
            res = raw["resolution"]
            kwargs["resolution"] = Resolution(int(res["width"]), int(res["height"]))
        for key in (
            "bounces",
            "samples",
            "alpha_walk_steps",
            "shadow_walk_steps",
            "tile_rays",
            "samples_per_launch",
            "samples_per_wavefront",
            "seed",
        ):
            if key in raw:
                # Only the walk depths are nullable (null = auto-size from
                # the scene); a null anywhere else is a config error and
                # must fail HERE with the key named, not at trace time.
                nullable = key in ("alpha_walk_steps", "shadow_walk_steps")
                if raw[key] is None and not nullable:
                    raise ValueError(f"profile key '{key}' must be an "
                                     f"integer, got null")
                kwargs[key] = None if raw[key] is None else int(raw[key])
        for key in ("brdf", "tonemap"):
            if key in raw:
                kwargs[key] = str(raw[key])
        return Profile(**kwargs)
