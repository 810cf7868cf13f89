"""Tonemap operators + gamma/quantize post-processing.

Reference parity: src/renderer/tonemap.rs:15-54 (Reinhard c/(c+1); Hejl-
Burgess-Dawson Filmic with 0.004 toe offset; Narkowicz ACES clamped) followed
by gamma 1/2.2 and a truncating, saturating u8 cast
(src/renderer/mod.rs:335-353). Note the reference applies gamma after ALL
tonemaps including Filmic — HBD filmic already encodes gamma, so Filmic output
is double-gamma'd. Reproduced as-is.
"""
from __future__ import annotations

import jax.numpy as jnp


def reinhard(c):
    return c / (c + 1.0)


def filmic(c):
    c = jnp.maximum(c - 0.004, 0.0)
    num = c * (6.2 * c + 0.5)
    denom = c * (6.2 * c + 1.7) + 0.06
    return num / denom


def aces(c):
    num = c * (2.51 * c + 0.03)
    denom = c * (2.43 * c + 0.59) + 0.14
    return jnp.clip(num / denom, 0.0, 1.0)


_TONEMAPS = {"REINHARD": reinhard, "FILMIC": filmic, "ACES": aces}


def tonemap(kind: str, color):
    return _TONEMAPS[kind](color)


def post_process(kind: str, color):
    """HDR color [..,3] → float in [0,255] after tonemap + gamma. The final u8
    cast truncates toward zero like Rust's `as u8` (saturating)."""
    c = tonemap(kind, color)
    c = jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)
    return jnp.clip(c * 255.0, 0.0, 255.0)


def to_u8(post: jnp.ndarray):
    return jnp.floor(post).astype(jnp.uint8)
