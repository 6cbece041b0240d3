"""Image load/save (reference uses stb, src/StbImpl.cpp + src/rtx/RtxHost.cpp:14-36).

Conventions:
  * Framework images are (H, W, 3) float32 in [0, 1]; row 0 is framebuffer
    row y=0 (GL-style, bottom-up) exactly as in the reference.  PNG export
    flips vertically, matching the reference screenshot path
    (src/ui/tools/UiPanelToolsView.cpp:237-239).
  * Textures load to (H, W, 4) float32 RGBA in [0, 1]; a missing texture is
    an 8x8 mid-gray (0x80) fully-opaque fallback (src/rtx/RtxHost.cpp:23-36).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_texture_rgba(path: str) -> np.ndarray:
    img = Image.open(path).convert("RGBA")
    return np.asarray(img, dtype=np.float32) / 255.0


def blank_texture() -> np.ndarray:
    tex = np.full((8, 8, 4), 0x80 / 255.0, np.float32)
    tex[..., 3] = 1.0
    return tex


def float_image_to_u8(img: np.ndarray) -> np.ndarray:
    """Reference quantization: value*256, clamped to [0, 255] (src/Trainer.cu:25-27)."""
    return np.clip((np.asarray(img, np.float32) * 256.0).astype(np.int32), 0, 255).astype(
        np.uint8
    )


def save_png(img: np.ndarray, path: str, flip_vertical: bool = True) -> None:
    """img: (H, W, 3) float [0,1] or uint8."""
    arr = img if img.dtype == np.uint8 else float_image_to_u8(img)
    if flip_vertical:
        arr = arr[::-1]
    Image.fromarray(arr).save(path)


def load_png(path: str, flip_vertical: bool = True) -> np.ndarray:
    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    if flip_vertical:
        arr = arr[::-1]
    return arr
