"""ray_tracing_tpu — a TPU-native (JAX/XLA/Pallas) differentiable Monte
Carlo path tracer.

A ground-up re-design of the capabilities of the reference Rust tracer
(sunziping2016/ray-tracing, lib name ``v4ray``): spheres,
triangles/meshes, axis-aligned rects, constant-density media,
instancing transforms, BVH acceleration, solid/checker/image/Perlin
textures, lambertian/metal/dielectric/diffuse-light/isotropic
materials, thin-lens camera, and mixture-PDF light importance
sampling — expressed as a wavefront over struct-of-arrays jnp tensors
instead of trait objects and 8-lane SIMD packets (reference:
src/lib.rs, src/renderer.rs).

Public surface mirrors the reference's ``v4ray`` Python module
(reference src/py.rs:62-86) plus the JSON scene loader
(reference src/json.rs:234-250).
"""

from ray_tracing_tpu.models.camera import Camera, CameraParam
from ray_tracing_tpu.models.compiler import (
    SceneBuilder,
    SceneBundle,
    build_scene,
    load_scene_json,
)
from ray_tracing_tpu.models.scene import SceneData
from ray_tracing_tpu.render.renderer import (
    Renderer,
    RendererParam,
    RenderResult,
    render_pass,
)

EPSILON = 1e-3  # reference src/lib.rs:34

__all__ = [
    "Camera",
    "CameraParam",
    "SceneBuilder",
    "SceneBundle",
    "SceneData",
    "Renderer",
    "RendererParam",
    "RenderResult",
    "render_pass",
    "build_scene",
    "load_scene_json",
    "EPSILON",
]

__version__ = "0.1.0"
