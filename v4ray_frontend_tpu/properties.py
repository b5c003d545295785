"""Property descriptors driving editor forms (reference
v4ray_frontend/properties.py:6-35): each plugin type declares its fields
as a flat list of these; the GUI builds widgets from them and stores
values as plain lists."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union
from uuid import UUID


@dataclass
class FloatProperty:
    name: str
    default: float = 0.0
    min: Optional[float] = None
    max: Optional[float] = None
    decimals: Optional[int] = None


@dataclass
class ColorProperty:
    name: str
    default: Tuple[int, int, int] = (255, 255, 255)

    @staticmethod
    def map_color(color: Tuple[int, int, int]) -> Tuple[float, float, float]:
        return color[0] / 255, color[1] / 255.0, color[2] / 255.0


@dataclass
class TextureProperty:
    name: str
    default: Optional[UUID] = None


AnyProperty = Union[FloatProperty, ColorProperty, TextureProperty]
