"""Shape plugin types for the scene editor (reference
v4ray_frontend/shape.py:16-91).  Each plugin is a stateless class of
static methods: ``kind`` names it, ``properties`` declares its form
fields, ``validate`` checks a value list, ``apply`` instantiates backend
shapes, and ``to_json``/``from_json`` round-trip the editor's project
format.  The registry here goes beyond the reference's (which only
registered Sphere) to cover every backend shape."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Protocol

import numpy as np

import v4ray_tpu as v4ray
from v4ray_frontend_tpu.properties import AnyProperty, FloatProperty


class ShapeLike(Protocol):
    def bounding_box(self) -> "v4ray.AABB": ...

    def hit(self, ray: "v4ray.Ray", t_min: np.ndarray,
            t_max: np.ndarray) -> "v4ray.HitRecord": ...


class ShapeType(ABC):
    @staticmethod
    @abstractmethod
    def kind() -> str: ...

    @staticmethod
    @abstractmethod
    def properties() -> List[AnyProperty]: ...

    @staticmethod
    @abstractmethod
    def validate(data: List[Any]) -> bool: ...

    @staticmethod
    @abstractmethod
    def apply(data: List[Any]) -> List[ShapeLike]: ...

    @staticmethod
    @abstractmethod
    def to_json(data: List[Any]) -> Dict[str, Any]: ...

    @staticmethod
    @abstractmethod
    def from_json(data: Dict[str, Any]) -> List[Any]: ...


class Sphere(ShapeType):
    @staticmethod
    def kind() -> str:
        return "sphere"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            FloatProperty("center x"),
            FloatProperty("center y"),
            FloatProperty("center z"),
            FloatProperty("radius"),
        ]

    @staticmethod
    def validate(data: List[Any]) -> bool:
        return float(data[3]) > 0

    @staticmethod
    def apply(data: List[Any]) -> List[ShapeLike]:
        return [v4ray.shape.Sphere((data[0], data[1], data[2]), data[3])]

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"center": [data[0], data[1], data[2]], "radius": data[3]}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        c = data["center"]
        return [c[0], c[1], c[2], data["radius"]]


def _rect_plugin(kind_name: str, cls, axis_names):
    a, b, k = axis_names

    class Rect(ShapeType):
        @staticmethod
        def kind() -> str:
            return kind_name

        @staticmethod
        def properties() -> List[AnyProperty]:
            return [
                FloatProperty(f"{a}0"),
                FloatProperty(f"{a}1", default=1.0),
                FloatProperty(f"{b}0"),
                FloatProperty(f"{b}1", default=1.0),
                FloatProperty(k),
                FloatProperty("positive (>0 = outward +)", default=1.0),
            ]

        @staticmethod
        def validate(data: List[Any]) -> bool:
            return float(data[0]) < float(data[1]) and float(data[2]) < float(data[3])

        @staticmethod
        def apply(data: List[Any]) -> List[ShapeLike]:
            return [cls(data[0], data[1], data[2], data[3], data[4],
                        positive=float(data[5]) > 0)]

        @staticmethod
        def to_json(data: List[Any]) -> Dict[str, Any]:
            return {
                f"{a}0": data[0], f"{a}1": data[1],
                f"{b}0": data[2], f"{b}1": data[3],
                k: data[4], "positive": float(data[5]) > 0,
            }

        @staticmethod
        def from_json(data: Dict[str, Any]) -> List[Any]:
            return [
                data[f"{a}0"], data[f"{a}1"], data[f"{b}0"], data[f"{b}1"],
                data[k], 1.0 if data.get("positive", True) else -1.0,
            ]

    Rect.__name__ = kind_name.replace("-", "_")
    return Rect


XYRect = _rect_plugin("xy-rect", v4ray.shape.XYRect, ("x", "y", "z"))
YZRect = _rect_plugin("yz-rect", v4ray.shape.YZRect, ("y", "z", "x"))
ZXRect = _rect_plugin("zx-rect", v4ray.shape.ZXRect, ("z", "x", "y"))


class Cuboid(ShapeType):
    @staticmethod
    def kind() -> str:
        return "cuboid"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            FloatProperty("p0 x"), FloatProperty("p0 y"), FloatProperty("p0 z"),
            FloatProperty("p1 x", default=1.0), FloatProperty("p1 y", default=1.0),
            FloatProperty("p1 z", default=1.0),
        ]

    @staticmethod
    def validate(data: List[Any]) -> bool:
        return all(float(data[i]) < float(data[i + 3]) for i in range(3))

    @staticmethod
    def apply(data: List[Any]) -> List[ShapeLike]:
        return [v4ray.shape.Cuboid(data[0:3], data[3:6])]

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {"p0": list(data[0:3]), "p1": list(data[3:6])}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        return [*data["p0"], *data["p1"]]


class Triangle(ShapeType):
    @staticmethod
    def kind() -> str:
        return "triangle"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            FloatProperty(f"v{i} {c}") for i in range(3) for c in "xyz"
        ]

    @staticmethod
    def validate(data: List[Any]) -> bool:
        p = np.asarray(data, np.float64).reshape(3, 3)
        return float(np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))) > 0

    @staticmethod
    def apply(data: List[Any]) -> List[ShapeLike]:
        p = np.asarray(data, np.float32).reshape(3, 3)
        return [v4ray.shape.Triangle(p)]

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        p = np.asarray(data, np.float64).reshape(3, 3)
        return {"vertices": p.tolist()}

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        return [x for row in data["vertices"] for x in row]
