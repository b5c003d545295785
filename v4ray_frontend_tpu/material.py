"""Material plugin types (reference v4ray_frontend/material.py:15-175),
extended with diffuse-light and isotropic.  ``apply_preview`` returns a
cheap stand-in used by the editor's live preview (gray lambertian for
glass, albedo-colored lambertian for metal — reference
material.py:111-114, 151-154)."""

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
from v4ray_frontend_tpu.texture import TextureLike


class MaterialLike(Protocol):
    ...


class MaterialType(ABC):
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
    def apply_preview(data: List[Any],
                      textures: Dict[UUID, TextureLike]) -> MaterialLike: ...

    @staticmethod
    @abstractmethod
    def apply(data: List[Any],
              textures: Dict[UUID, TextureLike]) -> MaterialLike: ...

    @staticmethod
    @abstractmethod
    def to_json(data: List[Any]) -> Dict[str, Any]: ...

    @staticmethod
    @abstractmethod
    def from_json(data: Dict[str, Any]) -> List[Any]: ...


class Lambertian(MaterialType):
    @staticmethod
    def kind() -> str:
        return "lambertian"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [TextureProperty(name="texture")]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return data[0] is not None and data[0] in valid_textures

    @staticmethod
    def apply_preview(data, textures):
        return v4ray.material.Lambertian(textures[data[0]])

    @staticmethod
    def apply(data, textures):
        return v4ray.material.Lambertian(textures[data[0]])

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {} if data[0] is None else {"texture": str(data[0])}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        texture = data.get("texture")
        return [UUID(texture) if texture is not None else None]


class Dielectric(MaterialType):
    @staticmethod
    def kind() -> str:
        return "dielectric"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [FloatProperty(name="refraction index", default=1.0)]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return float(data[0]) >= 1

    @staticmethod
    def apply_preview(data, textures):
        return v4ray.material.Lambertian(v4ray.texture.SolidColor((0.9, 0.9, 0.9)))

    @staticmethod
    def apply(data, textures):
        return v4ray.material.Dielectric(data[0])

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"ir": data[0]}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        return [data["ir"]]


class Metal(MaterialType):
    @staticmethod
    def kind() -> str:
        return "metal"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [ColorProperty(name="albedo"), FloatProperty(name="fuzz")]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return 0 <= float(data[1]) <= 1

    @staticmethod
    def apply_preview(data, textures):
        return v4ray.material.Lambertian(
            v4ray.texture.SolidColor(ColorProperty.map_color(data[0]))
        )

    @staticmethod
    def apply(data, textures):
        return v4ray.material.Metal(ColorProperty.map_color(data[0]), data[1])

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"albedo": "#%02x%02x%02x" % tuple(data[0]), "fuzz": data[1]}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        s = data["albedo"]
        return [
            (int(s[1:3], 16), int(s[3:5], 16), int(s[5:7], 16)),
            data["fuzz"],
        ]


class DiffuseLight(MaterialType):
    """Emissive material (backend material the reference editor lacked)."""

    @staticmethod
    def kind() -> str:
        return "diffuse light"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            ColorProperty(name="emit color"),
            FloatProperty(name="intensity", default=1.0),
        ]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return float(data[1]) >= 0

    @staticmethod
    def apply_preview(data, textures):
        return DiffuseLight.apply(data, textures)

    @staticmethod
    def apply(data, textures):
        c = ColorProperty.map_color(data[0])
        k = float(data[1])
        return v4ray.material.DiffuseLight(
            v4ray.texture.SolidColor((c[0] * k, c[1] * k, c[2] * k))
        )

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"emit": "#%02x%02x%02x" % tuple(data[0]), "intensity": data[1]}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        s = data["emit"]
        return [
            (int(s[1:3], 16), int(s[3:5], 16), int(s[5:7], 16)),
            data["intensity"],
        ]


class Isotropic(MaterialType):
    """Volume phase function (backend material the reference editor lacked)."""

    @staticmethod
    def kind() -> str:
        return "isotropic"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [TextureProperty(name="albedo")]

    @staticmethod
    def validate(data: List[Any], valid_textures: Set[UUID]) -> bool:
        return data[0] is not None and data[0] in valid_textures

    @staticmethod
    def apply_preview(data, textures):
        return v4ray.material.Lambertian(textures[data[0]])

    @staticmethod
    def apply(data, textures):
        return v4ray.material.Isotropic(textures[data[0]])

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {} if data[0] is None else {"albedo": str(data[0])}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        albedo = data.get("albedo")
        return [UUID(albedo) if albedo is not None else None]
