"""Texture plugin types (reference v4ray_frontend/texture.py:14-125),
extended with the backend's image and noise textures."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Protocol, Set
from uuid import UUID

import v4ray_tpu as v4ray
from v4ray_frontend_tpu.properties import (
    AnyProperty,
    ColorProperty,
    FloatProperty,
    TextureProperty,
)


class TextureLike(Protocol):
    ...


class TextureType(ABC):
    @staticmethod
    @abstractmethod
    def kind() -> str: ...

    @staticmethod
    @abstractmethod
    def properties() -> List[AnyProperty]: ...

    @staticmethod
    @abstractmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool: ...

    @staticmethod
    @abstractmethod
    def apply(data: List[Any], textures: Dict[UUID, TextureLike]) -> TextureLike: ...

    @staticmethod
    @abstractmethod
    def to_json(data: List[Any]) -> Dict[str, Any]: ...

    @staticmethod
    @abstractmethod
    def from_json(data: Dict[str, Any]) -> List[Any]: ...


def _hex(color) -> str:
    return "#%02x%02x%02x" % tuple(color)


def _unhex(s: str):
    return (int(s[1:3], 16), int(s[3:5], 16), int(s[5:7], 16))


class SolidColor(TextureType):
    @staticmethod
    def kind() -> str:
        return "solid color"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [ColorProperty(name="color")]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return True

    @staticmethod
    def apply(data: List[Any], textures: Dict[UUID, TextureLike]) -> TextureLike:
        return v4ray.texture.SolidColor(ColorProperty.map_color(data[0]))

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"color": _hex(data[0])}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        return [_unhex(data["color"])]


class Checker(TextureType):
    @staticmethod
    def kind() -> str:
        return "checker"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            TextureProperty(name="texture 1"),
            TextureProperty(name="texture 2"),
            FloatProperty(name="density", default=1.0),
        ]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return (
            data[0] is not None and data[0] in valid_textures
            and data[1] is not None and data[1] in valid_textures
            and data[2] > 0.0
        )

    @staticmethod
    def apply(data: List[Any], textures: Dict[UUID, TextureLike]) -> TextureLike:
        return v4ray.texture.Checker(textures[data[0]], textures[data[1]], data[2])

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        result: Dict[str, Any] = {}
        if data[0] is not None:
            result["texture1"] = str(data[0])
        if data[1] is not None:
            result["texture2"] = str(data[1])
        result["density"] = data[2]
        return result

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        t1, t2 = data.get("texture1"), data.get("texture2")
        return [
            UUID(t1) if t1 is not None else None,
            UUID(t2) if t2 is not None else None,
            data["density"],
        ]


class Noise(TextureType):
    """Perlin turbulence (backend texture the reference editor lacked)."""

    @staticmethod
    def kind() -> str:
        return "noise"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            FloatProperty(name="scale", default=1.0),
            FloatProperty(name="octaves", default=7.0, min=1.0, max=16.0,
                          decimals=0),
        ]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return float(data[0]) > 0 and int(data[1]) >= 1

    @staticmethod
    def apply(data: List[Any], textures: Dict[UUID, TextureLike]) -> TextureLike:
        return v4ray.texture.Noise(float(data[0]), int(data[1]))

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"scale": data[0], "depth": int(data[1])}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        return [data["scale"], float(data["depth"])]
