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


def save_hdr(path: str, rgb: np.ndarray) -> None:
    """Save (H, W, 3) float32 LINEAR radiance as Radiance RGBE (.hdr) —
    the production HDR output the LDR-only reference lacks.

    RGBE: mantissas are the three channels scaled by a shared power-of-2
    exponent (Ward's format; zero pixels encode as all-zero bytes)."""
    rgb = np.asarray(rgb, np.float32)
    h, w, _ = rgb.shape
    rgb = np.where(np.isfinite(rgb), np.maximum(rgb, 0.0), 0.0)
    brightest = rgb.max(axis=-1)
    # frexp: brightest = mant * 2**exp with mant in [0.5, 1)
    mant, exp = np.frexp(brightest)
    scale = np.where(brightest > 1e-32, mant * 256.0 / np.maximum(brightest, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    # exponent byte saturates at 255 (a ~2^127 firefly must clamp to the
    # max representable value, not wrap to an all-zero "black" pixel)
    rgbe[..., 3] = np.where(
        brightest > 1e-32, np.minimum(exp + 128, 255), 0
    ).astype(np.uint8)
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y {h} +X {w}\n".encode())
        fh.write(rgbe.tobytes())  # flat (uncompressed) scanlines


def load_hdr(path: str) -> np.ndarray:
    """Read a flat (uncompressed) Radiance RGBE file written by
    :func:`save_hdr` back to (H, W, 3) float32 linear radiance."""
    with open(path, "rb") as fh:
        data = fh.read()
    header, _, rest = data.partition(b"\n\n")
    assert data.startswith(b"#?RADIANCE"), "not a Radiance file"
    dims, _, pix = rest.partition(b"\n")
    tok = dims.split()
    h, w = int(tok[1]), int(tok[3])
    rgbe = np.frombuffer(pix, np.uint8, count=h * w * 4).reshape(h, w, 4)
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 128 - 8), 0.0)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None]
