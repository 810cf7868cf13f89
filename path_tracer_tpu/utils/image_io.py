"""PNG texture/image IO.

Replaces the reference's `image` crate usage (ref: texture_bank.rs:26-33 for
decode, main.rs:50 for encode). Gray conversion of non-gray PNGs uses the
Rec.709 luma the Rust image crate uses for into_luma8 (0.2126/0.7152/0.0722) —
NOT PIL's default Rec.601 — so opacity/metalness/roughness textures stored as
RGB decode identically.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def load_texture_rgb(path) -> np.ndarray:
    """Load a PNG as [H,W,3] float32 in [0,1] (raw values, no sRGB decode —
    linearization is a sample-time decision, ref material.rs:137-141)."""
    img = Image.open(path)
    arr = np.asarray(img.convert("RGB"), np.uint8)
    return arr.astype(np.float32) / 255.0


def load_texture_gray(path) -> np.ndarray:
    """Load a PNG as [H,W] float32 in [0,1].

    Gray PNGs pass through untouched; RGB(A) sources are reduced with Rec.709
    luma + round-half-up, matching the Rust image crate's into_luma8.
    """
    img = Image.open(path)
    if img.mode in ("L", "I;16", "I"):
        arr = np.asarray(img.convert("L"), np.uint8)
    else:
        rgb = np.asarray(img.convert("RGB"), np.float32)
        luma = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
        arr = np.floor(luma + 0.5).clip(0, 255).astype(np.uint8)
    return arr.astype(np.float32) / 255.0


def save_png(pixels_u8: np.ndarray, path) -> None:
    """Save [H,W,3] uint8 to PNG."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.asarray(pixels_u8, np.uint8), "RGB").save(path)
