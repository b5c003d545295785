"""Image output helpers (the reference CLI saves BMP via the ``image``
crate, reference src/main.rs:65-79)."""

from __future__ import annotations

import numpy as np


def save_image(path: str, rgb_u8: np.ndarray) -> None:
    """Save (H, W, 3) u8 to ``path``; format from the extension
    (.bmp/.png/.jpg...).  BMP goes through the native writer when the
    C++ library is available (the reference CLI's output format)."""
    if path.lower().endswith(".bmp"):
        from ray_tracing_tpu import native

        if native.write_bmp(path, rgb_u8):
            return
    from PIL import Image

    Image.fromarray(np.ascontiguousarray(rgb_u8)).save(path)
