"""Material shading: emission and scatter for a whole ray wavefront.

The reference dispatches on ``Arc<dyn Material>`` per bucket (reference
src/renderer.rs:204-274); here every ray evaluates the (cheap) closed
forms of all five material models and selects by material-type id — the
TPU-idiomatic trade of a few VPU flops for zero divergence.

Scatter consumes a fixed block of uniforms per bounce; the column
layout below is part of the renderer's reproducibility contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ray_tracing_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneData,
)
from ray_tracing_tpu.ops import geometry as geo
from ray_tracing_tpu.ops.geometry import take_rows
from ray_tracing_tpu.ops import sampling as smp
from ray_tracing_tpu.ops.intersect import Hit
from ray_tracing_tpu.ops.lights import lights_generate, lights_value
from ray_tracing_tpu.ops.textures import texture_value

# uniform column layout for one bounce's scatter block
U_COS_1 = 0  # cosine-pdf generate r1 (reference cosine.rs:39)
U_COS_2 = 1  # cosine-pdf generate r2
U_MIX_SELECT = 2  # mixture pdf branch (reference mixture.rs:28)
U_LIGHT_PICK = 3  # which light (reference group.rs:93)
U_LIGHT_1 = 4  # light-sample draw 1 (cone phi / rect a / tri x)
U_LIGHT_2 = 5  # light-sample draw 2
U_FUZZ_1 = 6  # metal in_unit_sphere theta (reference random.rs:53-65)
U_FUZZ_2 = 7  # metal in_unit_sphere cos_phi
U_FUZZ_3 = 8  # metal in_unit_sphere radius
U_DIELECTRIC = 9  # Schlick russian roulette (reference dielectric.rs:46)
U_ISO_1 = 10  # isotropic on_unit_sphere z
U_ISO_2 = 11  # isotropic on_unit_sphere theta
N_SCATTER_U = 12


class Scatter(NamedTuple):
    direction: jnp.ndarray  # (N, 3) unit
    coef: jnp.ndarray  # (N, 3) throughput multiplier
    scattered: jnp.ndarray  # (N,) bool — False = path terminates


def emitted_color(scene: SceneData, hit: Hit) -> jnp.ndarray:
    """Emission at a hit.  Only diffuse-light emits, one-sided
    (reference diffuse_light.rs:18-23)."""
    mat = scene.materials
    tex = texture_value(scene.textures, take_rows(mat.tex, hit.material), hit.uv, hit.p)
    return _emitted_given_tex(scene, hit, tex)


def _emitted_given_tex(scene: SceneData, hit: Hit, tex: jnp.ndarray) -> jnp.ndarray:
    mtype = take_rows(scene.materials.mtype, hit.material)
    is_light = (mtype == MAT_DIFFUSE_LIGHT) & hit.front_face
    return jnp.where(is_light[..., None], tex, 0.0)


class ShadeAux(NamedTuple):
    """Per-ray shading facts needed by path-replay backprop
    (render/prb.py): which color-source entry fed this bounce."""

    leaf_tex: jnp.ndarray  # (N,) i32 resolved texture leaf id
    leaf_is_solid: jnp.ndarray  # (N,) bool — leaf reads textures.color
    tex_value: jnp.ndarray  # (N, 3) the evaluated texture color
    leaf_is_image: jnp.ndarray  # (N,) bool — leaf reads textures.images
    texel: jnp.ndarray  # (N,) i32 flat atlas index (img*H + j)*W + i


def shade(scene: SceneData, hit: Hit, rd_in: jnp.ndarray, u: jnp.ndarray,
          with_aux: bool = False):
    """Fused emission + scatter: evaluates the hit's material texture
    once (it feeds both the diffuse-light emission and the lambertian /
    isotropic attenuation).  Returns (emitted (N,3), Scatter[, ShadeAux])."""
    from ray_tracing_tpu.models.scene import TEX_IMAGE, TEX_SOLID
    from ray_tracing_tpu.ops.textures import image_texel_index

    tt = scene.textures
    tex_idx = take_rows(scene.materials.tex, hit.material)
    if with_aux:
        # one checker walk serves both the color and the PRB leaf aux
        tex, leaf = texture_value(tt, tex_idx, hit.uv, hit.p, with_leaf=True)
    else:
        tex = texture_value(tt, tex_idx, hit.uv, hit.p)
    out = (
        _emitted_given_tex(scene, hit, tex),
        _scatter_given_tex(scene, hit, rd_in, u, tex),
    )
    if not with_aux:
        return out
    if tt.images.shape[0] > 0:
        leaf_is_image = take_rows(tt.ttype, leaf) == TEX_IMAGE
        img = take_rows(tt.image, leaf)
        j, i = image_texel_index(tt, img, hit.uv)
        hmax, wmax = tt.images.shape[1], tt.images.shape[2]
        texel = (img * hmax + j) * wmax + i
    else:
        leaf_is_image = jnp.zeros(leaf.shape, bool)
        texel = jnp.zeros(leaf.shape, jnp.int32)
    aux = ShadeAux(
        leaf_tex=leaf,
        leaf_is_solid=take_rows(tt.ttype, leaf) == TEX_SOLID,
        tex_value=tex,
        leaf_is_image=leaf_is_image,
        texel=texel,
    )
    return out + (aux,)


def scatter(scene: SceneData, hit: Hit, rd_in: jnp.ndarray, u: jnp.ndarray) -> Scatter:
    """One scatter decision per ray.

    rd_in: (N, 3) unit incoming directions; u: (N, N_SCATTER_U) uniforms.
    Implements the estimator of reference renderer.rs:231-263: Scatter
    materials mix the material pdf with the light pdf 50/50 and weight by
    p_material / p_mixture; Specular materials pass attenuation through.
    """
    tex = texture_value(
        scene.textures, take_rows(scene.materials.tex, hit.material), hit.uv, hit.p
    )
    return _scatter_given_tex(scene, hit, rd_in, u, tex)


def _scatter_given_tex(
    scene: SceneData, hit: Hit, rd_in: jnp.ndarray, u: jnp.ndarray, tex: jnp.ndarray
) -> Scatter:
    mat = scene.materials
    mtype = take_rows(mat.mtype, hit.material)
    n = hit.normal

    # --- lambertian (the only ScatterRecord::Scatter material,
    #     reference lambertian.rs:36-47) ---
    cos_dir = smp.cosine_pdf_generate(n, u[:, U_COS_1], u[:, U_COS_2])
    if scene.has_lights:
        light_dir = lights_generate(
            scene, hit.p, u[:, U_LIGHT_PICK], u[:, U_LIGHT_1], u[:, U_LIGHT_2]
        )
        mix_dir = jnp.where(
            (u[:, U_MIX_SELECT] < 0.5)[..., None], light_dir, cos_dir
        )
        p_mat = smp.cosine_pdf_value(n, mix_dir)
        p_light = lights_value(scene, hit.p, mix_dir)
        p_mix = 0.5 * p_light + 0.5 * p_mat
        weight = jnp.where(p_mix > 0.0, p_mat / p_mix, 0.0)
        lamb_dir = mix_dir
        lamb_coef = tex * weight[..., None]
    else:
        lamb_dir = cos_dir
        lamb_coef = tex

    # --- metal (reference metal.rs:31-46) ---
    reflected = smp.reflect(rd_in, n)
    fuzz_vec = smp.random_in_unit_sphere(u[:, U_FUZZ_1], u[:, U_FUZZ_2], u[:, U_FUZZ_3])
    metal_dir = geo.normalize(
        reflected + fuzz_vec * take_rows(mat.fuzz, hit.material)[..., None]
    )
    metal_coef = take_rows(mat.albedo, hit.material)

    # --- dielectric (reference dielectric.rs:33-60) ---
    ir = take_rows(mat.ir, hit.material)
    ratio = jnp.where(hit.front_face, 1.0 / jnp.maximum(ir, 1e-8), ir)
    cos_theta = -geo.dot(rd_in, n)
    # double-where: guard the sqrt VJP at |cos| = 1 (see sampling.refract)
    s2 = 1.0 - cos_theta * cos_theta
    sin_theta = jnp.where(s2 > 0.0, jnp.sqrt(jnp.where(s2 > 0.0, s2, 1.0)), 0.0)
    cannot_refract = (ratio * sin_theta) > 1.0
    cannot_refract = cannot_refract | (
        smp.schlick_reflectance(cos_theta, ratio) > u[:, U_DIELECTRIC]
    )
    diel_dir = jnp.where(
        cannot_refract[..., None],
        smp.reflect(rd_in, n),
        smp.refract(rd_in, n, ratio),
    )

    # --- isotropic (reference isotropic.rs:26-43) ---
    iso_dir = smp.random_on_unit_sphere(u[:, U_ISO_1], u[:, U_ISO_2])

    # --- select by material type ---
    is_lamb = (mtype == MAT_LAMBERTIAN)[..., None]
    is_metal = (mtype == MAT_METAL)[..., None]
    is_diel = (mtype == MAT_DIELECTRIC)[..., None]
    is_iso = (mtype == MAT_ISOTROPIC)[..., None]

    direction = jnp.where(
        is_lamb,
        lamb_dir,
        jnp.where(is_metal, metal_dir, jnp.where(is_diel, diel_dir, iso_dir)),
    )
    coef = jnp.where(
        is_lamb,
        lamb_coef,
        jnp.where(
            is_metal,
            metal_coef,
            jnp.where(is_diel, jnp.ones_like(lamb_coef), tex),
        ),
    )
    scattered = mtype != MAT_DIFFUSE_LIGHT
    return Scatter(direction=direction, coef=coef, scattered=scattered)
