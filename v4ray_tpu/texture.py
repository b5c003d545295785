"""``v4ray.texture`` submodule (reference src/py.rs:80-83,
src/texture/*.rs pyclasses) plus JSON-only texture types."""

from __future__ import annotations

from typing import Tuple

import numpy as np


class SolidColor:
    """reference src/texture/solid_color.rs."""

    def __init__(self, color: Tuple[float, float, float]):
        self.color = tuple(float(x) for x in color)

    def _build(self, b) -> int:
        return b.add_texture_solid(self.color)


class Checker:
    """reference src/texture/checker.rs."""

    def __init__(self, texture1, texture2, density: float):
        self.odd = texture1
        self.even = texture2
        self.density = float(density)

    def _build(self, b) -> int:
        return b.add_texture_checker(
            self.odd._build(b), self.even._build(b), self.density
        )


class Image:
    """reference src/texture/image.rs; accepts a path or an array."""

    def __init__(self, image):
        if isinstance(image, str):
            from PIL import Image as PILImage

            with PILImage.open(image) as im:
                image = np.asarray(im.convert("RGB"))
        self.image = np.asarray(image)

    def _build(self, b) -> int:
        return b.add_texture_image(self.image)


class Noise:
    """reference src/texture/noise.rs (Perlin turbulence)."""

    def __init__(self, scale: float, depth: int):
        self.scale = float(scale)
        self.depth = int(depth)

    def _build(self, b) -> int:
        return b.add_texture_noise(self.scale, self.depth)
