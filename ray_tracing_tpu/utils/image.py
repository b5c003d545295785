"""Image output helpers (the reference CLI saves BMP via the ``image``
crate, reference src/main.rs:65-79)."""

from __future__ import annotations

import numpy as np


def save_image(path: str, rgb_u8: np.ndarray) -> None:
    """Save (H, W, 3) u8 to ``path``; format from the extension
    (.bmp/.png/.jpg...)."""
    from PIL import Image

    Image.fromarray(np.ascontiguousarray(rgb_u8)).save(path)
