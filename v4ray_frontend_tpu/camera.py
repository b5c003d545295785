"""Camera plugin type (reference v4ray_frontend/camera.py:13-135)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Protocol

import v4ray_tpu as v4ray
from v4ray_frontend_tpu.properties import AnyProperty, FloatProperty


class CameraLike(Protocol):
    ...


class CameraType(ABC):
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
    def apply(data: List[Any]) -> CameraLike: ...

    @staticmethod
    @abstractmethod
    def apply_preview(data: List[Any]) -> CameraLike: ...

    @staticmethod
    @abstractmethod
    def to_json(data: List[Any]) -> Dict[str, Any]: ...

    @staticmethod
    @abstractmethod
    def from_json(data: Dict[str, Any]) -> List[Any]: ...


class PerspectiveCamera(CameraType):
    @staticmethod
    def kind() -> str:
        return "perspective"

    @staticmethod
    def properties() -> List[AnyProperty]:
        return [
            FloatProperty("position x"),  # 0
            FloatProperty("position y"),  # 1
            FloatProperty("position z", default=-10),  # 2
            FloatProperty("look at x"),  # 3
            FloatProperty("look at y"),  # 4
            FloatProperty("look at z"),  # 5
            FloatProperty("vertical fov (deg)", default=20),  # 6
            FloatProperty("up x", default=0.0),  # 7
            FloatProperty("up y", default=1.0),  # 8
            FloatProperty("up z", default=0.0),  # 9
            FloatProperty("aperture", default=0.0),  # 10
            FloatProperty("focus distance", default=10.0),  # 11
            FloatProperty("shutter time 0", default=0.0),  # 12
            FloatProperty("shutter time 1", default=0.0),  # 13
        ]

    @staticmethod
    def validate(data: List[Any]) -> bool:
        return (
            0 < float(data[6]) < 180
            and float(data[10]) >= 0
            and float(data[11]) > 0
            and float(data[12]) <= float(data[13])
        )

    @staticmethod
    def _apply(data: List[Any], aperture: float) -> CameraLike:
        return v4ray.PerspectiveCameraParam(
            look_from=(data[0], data[1], data[2]),
            look_at=(data[3], data[4], data[5]),
            vfov=data[6],
            up=(data[7], data[8], data[9]),
            aperture=aperture,
            focus_dist=data[11],
            time0=data[12],
            time1=data[13],
        )

    @staticmethod
    def apply(data: List[Any]) -> CameraLike:
        return PerspectiveCamera._apply(data, data[10])

    @staticmethod
    def apply_preview(data: List[Any]) -> CameraLike:
        # preview forces a pinhole aperture (reference camera.py:92-103)
        return PerspectiveCamera._apply(data, 0.0)

    @staticmethod
    def to_json(data: List[Any]) -> Dict[str, Any]:
        return {
            "look_from": [data[0], data[1], data[2]],
            "look_at": [data[3], data[4], data[5]],
            "vfov": data[6],
            "up": [data[7], data[8], data[9]],
            "aperture": data[10],
            "focus_dist": data[11],
            "time0": data[12],
            "time1": data[13],
        }

    @staticmethod
    def from_json(data: Dict[str, Any]) -> List[Any]:
        return [
            *data["look_from"],
            *data["look_at"],
            data["vfov"],
            *data["up"],
            data["aperture"],
            data["focus_dist"],
            data["time0"],
            data["time1"],
        ]
