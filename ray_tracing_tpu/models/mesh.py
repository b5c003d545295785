"""Wavefront OBJ loading with the reference's exact mesh semantics
(reference src/hittables/obj.rs:30-104 + tobj triangulate).

Produces numpy triangle soups: per-face vertex positions, shading
normals and UVs.  When the file has no normals, smooth per-vertex
normals are accumulated from area-weighted face normals
``(p2-p1) x (p3-p2)`` normalized per face then summed per vertex and
re-normalized — exactly obj.rs:66-70, 86-97.  Polygons triangulate as
fans (tobj LoadOptions { triangulate: true }).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple, Union

import numpy as np


@dataclasses.dataclass
class ObjModel:
    name: str
    # per-face-vertex index triples, shape (F, 3)
    indices: np.ndarray  # position indices
    normal_indices: Optional[np.ndarray]  # None when absent
    texcoord_indices: Optional[np.ndarray]


@dataclasses.dataclass
class ObjFile:
    positions: np.ndarray  # (V, 3)
    normals: np.ndarray  # (VN, 3)
    texcoords: np.ndarray  # (VT, 2)
    models: List[ObjModel]


def load_triangles(
    path: str, model: Union[int, str, None] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """OBJ file -> (pts (F,3,3), normals, uvs), preferring the native C++
    loader (native/src/v4ray_native.cpp) with this module as fallback —
    both produce identical arrays (tests assert parity)."""
    from ray_tracing_tpu import native

    out = native.obj_triangles(path, model)
    if out is not None:
        return out
    return mesh_triangles(parse_obj(path), model)


def _resolve(idx: int, count: int) -> int:
    """OBJ 1-based, negative = relative to end."""
    return idx - 1 if idx > 0 else count + idx


def parse_obj(path: str) -> ObjFile:
    positions: List[List[float]] = []
    normals: List[List[float]] = []
    texcoords: List[List[float]] = []
    models: List[Dict] = []

    def new_model(name: str):
        models.append({"name": name, "f": [], "fn": [], "ft": [], "has_n": False,
                       "has_t": False})

    new_model("")
    with open(path, "r") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                texcoords.append([float(x) for x in parts[1:3]])
            elif tag in ("o", "g"):
                name = parts[1] if len(parts) > 1 else ""
                if models[-1]["f"]:
                    new_model(name)
                else:
                    models[-1]["name"] = name
            elif tag == "f":
                corners = []
                for spec in parts[1:]:
                    fields = spec.split("/")
                    vi = _resolve(int(fields[0]), len(positions))
                    ti = (
                        _resolve(int(fields[1]), len(texcoords))
                        if len(fields) > 1 and fields[1]
                        else None
                    )
                    ni = (
                        _resolve(int(fields[2]), len(normals))
                        if len(fields) > 2 and fields[2]
                        else None
                    )
                    corners.append((vi, ti, ni))
                m = models[-1]
                # fan triangulation; keep fn/ft ROW-ALIGNED with f via
                # -1 sentinels (a file mixing 'f a//n ...' and 'f a ...'
                # faces must not pair face i with face j's normals)
                for a in range(1, len(corners) - 1):
                    tri = (corners[0], corners[a], corners[a + 1])
                    m["f"].append([c[0] for c in tri])
                    m["fn"].append(
                        [c[2] if c[2] is not None else -1 for c in tri]
                    )
                    m["ft"].append(
                        [c[1] if c[1] is not None else -1 for c in tri]
                    )
                    if all(c[2] is not None for c in tri):
                        m["has_n"] = True
                    if all(c[1] is not None for c in tri):
                        m["has_t"] = True

    out_models = []
    for m in models:
        if not m["f"]:
            continue
        fn = np.asarray(m["fn"], np.int64)
        ft = np.asarray(m["ft"], np.int64)
        out_models.append(
            ObjModel(
                name=m["name"],
                indices=np.asarray(m["f"], np.int64),
                # all-or-nothing per model, like the reference's tobj
                # path (obj.rs:64-70): ANY corner without vn -> smooth
                # vertex normals for the whole model
                normal_indices=fn if m["has_n"] and (fn >= 0).all() else None,
                texcoord_indices=ft if m["has_t"] else None,
            )
        )
    return ObjFile(
        positions=np.asarray(positions, np.float32).reshape(-1, 3),
        normals=np.asarray(normals, np.float32).reshape(-1, 3),
        texcoords=np.asarray(texcoords, np.float32).reshape(-1, 2),
        models=out_models,
    )


def mesh_triangles(
    obj: ObjFile, model: Union[int, str, None] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand one model into (points (F,3,3), normals (F,3,3), uvs (F,3,2)).

    Model selection matches reference json.rs:627-637: None -> first,
    int -> by index, str -> by name.
    """
    if model is None:
        m = obj.models[0]
    elif isinstance(model, int):
        m = obj.models[model]
    else:
        matches = [mm for mm in obj.models if mm.name == model]
        if not matches:
            raise KeyError(f"cannot find the model {model!r}")
        m = matches[0]

    pts = obj.positions[m.indices]  # (F, 3, 3)

    if m.normal_indices is not None:
        nrm = obj.normals[m.normal_indices]
    else:
        # smooth vertex normals (reference obj.rs:35-38, 64-70, 86-97)
        face_n = np.cross(
            pts[:, 1] - pts[:, 0], pts[:, 2] - pts[:, 1]
        )
        face_n = face_n / np.maximum(
            np.linalg.norm(face_n, axis=-1, keepdims=True), 1e-30
        )
        vertex_n = np.zeros_like(obj.positions)
        for corner in range(3):
            np.add.at(vertex_n, m.indices[:, corner], face_n)
        vertex_n = vertex_n / np.maximum(
            np.linalg.norm(vertex_n, axis=-1, keepdims=True), 1e-30
        )
        nrm = vertex_n[m.indices]

    if m.texcoord_indices is not None:
        # corners without a vt (-1 sentinel) read uv (0, 0)
        safe = np.maximum(m.texcoord_indices, 0)
        uvs = np.where(
            (m.texcoord_indices >= 0)[..., None], obj.texcoords[safe], 0.0
        )
    else:
        uvs = np.zeros((pts.shape[0], 3, 2), np.float32)

    return pts.astype(np.float32), nrm.astype(np.float32), uvs.astype(np.float32)
