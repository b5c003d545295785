"""Independent scalar-NumPy transliteration of the reference estimator.

This module is a TEST ORACLE: a deliberately slow, per-ray, pure
numpy/Python port of the reference renderer's radiance estimator —
recursion structure from /root/reference/src/renderer.rs:123-320
(emitted overwrites background on hit, MIS coefficient
attenuation * p_material / p_mixture, specular bypasses MIS, depth
exhaustion returns scene.environment), PDFs from src/pdf/{cosine,
mixture,hittables}.rs and the Samplable impls in src/hittable/
{sphere,aa_rect}.rs, materials from src/material/{lambertian,metal,
dielectric,diffuse_light,isotropic}.rs, camera from
src/camera.rs:77-129, textures from src/texture/{solid_color,
checker}.rs.

It shares ZERO code with ray_tracing_tpu.ops / ray_tracing_tpu.render
(its own RNG — numpy Generator — its own vector math, its own shape
classes), so agreement between a production render and this oracle at
the Monte-Carlo noise floor is an independent check of the whole
estimator, not a reflection through shared primitives.
"""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-3


def _unit(v):
    return v / np.linalg.norm(v)


# -- textures (solid_color.rs, checker.rs:31-38) -----------------------


class Solid:
    def __init__(self, color):
        self.color = np.asarray(color, np.float32)

    def value(self, uv, p):
        return self.color


class CheckerTex:
    def __init__(self, odd, even, density):
        self.odd, self.even, self.density = odd, even, density

    def value(self, uv, p):
        d = self.density
        sines = math.sin(d * p[0]) * math.sin(d * p[1]) * math.sin(d * p[2])
        return (self.even if sines > 0 else self.odd).value(uv, p)


class ImageTex:
    """Nearest-neighbor image lookup (image.rs:26-72: clamp u and v to
    [0, 1], FLIP v, scale by width/height, truncate, clamp to the last
    row/column, /255)."""

    def __init__(self, array_u8):
        self.img = np.asarray(array_u8)  # (H, W, 3) u8

    def value(self, uv, p):
        h, w = self.img.shape[:2]
        u = min(max(uv[0], 0.0), 1.0)
        v = 1.0 - min(max(uv[1], 0.0), 1.0)
        i = min(int(w * u), w - 1)
        j = min(int(h * v), h - 1)
        return self.img[j, i].astype(np.float64) / 255.0


# -- shapes (sphere.rs, aa_rect.rs) ------------------------------------


class SphereO:
    def __init__(self, center, radius):
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)

    def hit(self, ro, rd, t_min, t_max):
        oc = ro - self.center
        half_b = oc @ rd
        c = oc @ oc - self.radius * self.radius
        disc = half_b * half_b - c
        if disc < 0:
            return None
        sq = math.sqrt(disc)
        root = -half_b - sq
        if not (t_min <= root <= t_max):
            root = -half_b + sq
            if not (t_min <= root <= t_max):
                return None
        p = ro + root * rd
        outward = _unit(p - self.center)
        front = rd @ outward < 0
        normal = outward if front else -outward
        # sphere_uv (sphere.rs:38-46)
        theta = math.acos(max(-1.0, min(1.0, -outward[1])))
        phi = math.atan2(-outward[2], outward[0]) + math.pi
        uv = (phi / (2 * math.pi), theta / math.pi)
        return dict(t=root, p=p, normal=normal, front=front, uv=uv)

    # Samplable (sphere.rs:100-144)
    def pdf_value(self, origin, direction):
        if self.hit(origin, direction, EPS, math.inf) is None:
            return 0.0
        d2 = np.sum((self.center - origin) ** 2)
        arg = 1.0 - self.radius * self.radius / d2
        cos_max = math.sqrt(max(arg, 0.0))
        solid_angle = 2 * math.pi * (1 - cos_max)
        return 1.0 / solid_angle if solid_angle > 0 else math.inf

    def generate(self, origin, rng):
        direction = self.center - origin
        d2 = direction @ direction
        # random_to_sphere (random.rs:27-39)
        phi = rng.uniform(0, 2 * math.pi)
        r2 = rng.uniform()
        z = 1 + r2 * (math.sqrt(max(0.0, 1 - self.radius ** 2 / d2)) - 1)
        xy = math.sqrt(max(0.0, 1 - z * z))
        local = np.array([math.cos(phi) * xy, math.sin(phi) * xy, z])
        return _unit(_face_towards(direction) @ local)


class RectO:
    """Axis-aligned rect; axes = (idx0, idx1, idx2) as in the
    rect_shape! macro instantiations (aa_rect.rs:190-192)."""

    def __init__(self, axes, a0, a1, b0, b1, k, positive=True):
        self.i0, self.i1, self.i2 = axes
        self.a0, self.a1, self.b0, self.b1 = a0, a1, b0, b1
        self.k, self.positive = k, positive

    def hit(self, ro, rd, t_min, t_max):
        if rd[self.i2] == 0:
            return None
        t = (self.k - ro[self.i2]) / rd[self.i2]
        if not (t_min <= t <= t_max):
            return None
        a = ro[self.i0] + t * rd[self.i0]
        b = ro[self.i1] + t * rd[self.i1]
        if not (self.a0 <= a <= self.a1 and self.b0 <= b <= self.b1):
            return None
        uv = ((a - self.a0) / (self.a1 - self.a0),
              (b - self.b0) / (self.b1 - self.b0))
        outward = np.zeros(3)
        outward[self.i2] = 1.0 if self.positive else -1.0
        front = rd @ outward < 0
        normal = outward if front else -outward
        return dict(t=t, p=ro + t * rd, normal=normal, front=front, uv=uv)

    # Samplable (aa_rect.rs:151-185)
    def pdf_value(self, origin, direction):
        rec = self.hit(origin, direction, EPS, math.inf)
        if rec is None:
            return 0.0
        area = (self.a1 - self.a0) * (self.b1 - self.b0)
        d2 = rec["t"] * rec["t"]
        cosine = abs(direction @ rec["normal"])
        return d2 / (cosine * area) if cosine > 0 else math.inf

    def generate(self, origin, rng):
        p = np.zeros(3)
        p[self.i0] = rng.uniform(self.a0, self.a1)
        p[self.i1] = rng.uniform(self.b0, self.b1)
        p[self.i2] = self.k
        return _unit(p - origin)


class TransformO:
    """Instancing transform over any shape (transform.rs:53-125,
    quirks preserved: the object is hit in object space with the
    window scaled by |inv·d|, the hit point maps back through M, and
    the NORMAL maps through M too — not its inverse transpose)."""

    def __init__(self, shape, m, t):
        self.shape = shape
        self.m = np.asarray(m, np.float64)
        self.t = np.asarray(t, np.float64)
        self.inv = np.linalg.inv(self.m)
        self.inv_t = -self.inv @ self.t

    def hit(self, ro, rd, t_min, t_max):
        d = self.inv @ rd
        norm = np.linalg.norm(d)
        rec = self.shape.hit(self.inv @ ro + self.inv_t, d / norm,
                             t_min * norm, t_max * norm)
        if rec is None:
            return None
        rec = dict(rec)
        rec["p"] = self.m @ rec["p"] + self.t
        rec["normal"] = _unit(self.m @ rec["normal"])
        rec["t"] = rec["t"] / norm
        return rec

    # Samplable (transform.rs:99-125)
    def pdf_value(self, origin, direction):
        o = self.inv @ origin + self.inv_t
        d = self.inv @ direction
        return self.shape.pdf_value(o, _unit(d))

    def generate(self, origin, rng):
        o = self.inv @ origin + self.inv_t
        return _unit(self.m @ self.shape.generate(o, rng))


class ConstantMediumO:
    """Constant-density participating medium over any boundary shape
    (constant_medium.rs:40-86, quirks preserved: the flight distance
    is measured against the [max(t1, 0), t2] window but the reported t
    is ``t1 + flight`` from the RAW first hit)."""

    def __init__(self, boundary, density):
        self.boundary = boundary
        self.neg_inv_density = -1.0 / density

    def hit(self, ro, rd, t_min, t_max, rng=None):
        h1 = self.boundary.hit(ro, rd, -math.inf, math.inf)
        if h1 is None:
            return None
        h2 = self.boundary.hit(ro, rd, h1["t"] + EPS, math.inf)
        if h2 is None:
            return None
        lo = max(h1["t"], t_min)
        hi = min(h2["t"], t_max)
        if lo >= hi:
            return None
        lo0 = max(lo, 0.0)
        inside = hi - lo0
        flight = self.neg_inv_density * math.log(rng.uniform())
        if flight > inside:
            return None
        t = h1["t"] + flight
        return dict(t=t, p=ro + t * rd,
                    normal=np.array([1.0, 0.0, 0.0]), front=True,
                    uv=(0.0, 0.0))


def _face_towards(direction):
    """Rotation whose +z is ``direction`` (nalgebra
    Rotation3::face_towards as used by CosinePdf/sphere sampling:
    zaxis = dir, xaxis = up x zaxis, yaxis = zaxis x xaxis)."""
    z = _unit(np.asarray(direction, np.float64))
    up = (np.array([0.0, 1.0, 0.0]) if abs(z[0]) > 0.9
          else np.array([1.0, 0.0, 0.0]))
    # cosine.rs:16-25 picks up = (0,1,0) when |dir_x| > 0.9 else (1,0,0)
    x = _unit(np.cross(up, z))
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)


# -- PDFs (cosine.rs, mixture.rs, hittables.rs) ------------------------


class CosinePdf:
    def __init__(self, normal):
        self.dir = np.asarray(normal, np.float64)
        self.rot = _face_towards(self.dir)

    def value(self, direction):
        cosine = direction @ self.dir
        return cosine / math.pi if cosine > 0 else 0.0

    def generate(self, rng):
        r1, r2 = rng.uniform(), rng.uniform()
        z = math.sqrt(1 - r2)
        phi = 2 * math.pi * r1
        sr2 = math.sqrt(r2)
        local = np.array([math.cos(phi) * sr2, math.sin(phi) * sr2, z])
        return _unit(self.rot @ local)


class LightsPdf:
    """HittablePdf over the light group (group.rs:70-96: value =
    average of member values, generate = uniformly random member)."""

    def __init__(self, origin, lights):
        self.origin, self.lights = origin, lights

    def value(self, direction):
        w = 1.0 / len(self.lights)
        return sum(w * l.pdf_value(self.origin, direction)
                   for l in self.lights)

    def generate(self, rng):
        i = rng.integers(0, len(self.lights))
        return self.lights[i].generate(self.origin, rng)


# -- materials (material/*.rs) -----------------------------------------


class LambertianM:
    def __init__(self, texture):
        self.texture = texture

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, rd, rec, rng):
        return ("pdf", self.texture.value(rec["uv"], rec["p"]),
                CosinePdf(rec["normal"]))


class MetalM:
    def __init__(self, albedo, fuzz):
        self.albedo = np.asarray(albedo, np.float64)
        self.fuzz = float(fuzz)

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, rd, rec, rng):
        reflected = rd - 2.0 * (rd @ rec["normal"]) * rec["normal"]
        # random_in_unit_sphere (random.rs:53-65)
        theta = rng.uniform(0, 2 * math.pi)
        cos_phi = rng.uniform(-1, 1)
        r = rng.uniform() ** (1.0 / 3.0)
        sin_phi = math.sqrt(1 - cos_phi * cos_phi)
        jitter = r * np.array([
            sin_phi * math.cos(theta), sin_phi * math.sin(theta), cos_phi,
        ])
        return ("spec", self.albedo.copy(),
                _unit(reflected + self.fuzz * jitter))


class DielectricM:
    def __init__(self, ir):
        self.ir = float(ir)

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, rd, rec, rng):
        ratio = 1.0 / self.ir if rec["front"] else self.ir
        cos_t = min(1.0, -(rd @ rec["normal"]))
        sin_t = math.sqrt(max(0.0, 1 - cos_t * cos_t))
        r0 = ((1 - ratio) / (1 + ratio)) ** 2
        schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
        if ratio * sin_t > 1.0 or schlick > rng.uniform():
            direction = rd - 2.0 * (rd @ rec["normal"]) * rec["normal"]
        else:
            perp = ratio * (rd + cos_t * rec["normal"])
            par = -math.sqrt(max(0.0, 1 - perp @ perp)) * rec["normal"]
            direction = perp + par
        return ("spec", np.ones(3), _unit(direction))


class DiffuseLightM:
    def __init__(self, emit):
        self.emit = emit

    def emitted(self, rec):
        if rec["front"]:
            return np.asarray(self.emit.value(rec["uv"], rec["p"]),
                              np.float64)
        return np.zeros(3)

    def scatter(self, rd, rec, rng):
        return None


class IsotropicM:
    def __init__(self, albedo):
        self.albedo = albedo

    def emitted(self, rec):
        return np.zeros(3)

    def scatter(self, rd, rec, rng):
        # random_on_unit_sphere (random.rs:41-51)
        z = rng.uniform(-1, 1)
        theta = rng.uniform(0, 2 * math.pi)
        xy = math.sqrt(1 - z * z)
        return ("spec", np.asarray(
            self.albedo.value(rec["uv"], rec["p"]), np.float64),
            np.array([math.cos(theta) * xy, math.sin(theta) * xy, z]))


# -- scene + estimator (renderer.rs:123-320) ---------------------------


class OracleScene:
    def __init__(self, background, environment):
        self.background = np.asarray(background, np.float64)
        self.environment = np.asarray(environment, np.float64)
        self.objects = []   # (shape, material)
        self.lights = []    # shapes of important objects

    def add(self, shape, material, important=False):
        self.objects.append((shape, material))
        if important:
            self.lights.append(shape)


def ray_color(scene, ro, rd, depth, rng):
    """One ray's radiance, recursion per renderer.rs:123-320."""
    if depth == 0:
        return scene.environment.copy()
    best = None
    best_mat = None
    for shape, mat in scene.objects:
        if isinstance(shape, ConstantMediumO):  # stochastic hit
            rec = shape.hit(ro, rd, EPS, math.inf, rng)
        else:
            rec = shape.hit(ro, rd, EPS, math.inf)
        if rec is not None and (best is None or rec["t"] < best["t"]):
            best, best_mat = rec, mat
    if best is None:
        return scene.background.copy()
    color = best_mat.emitted(best)
    sc = best_mat.scatter(rd, best, rng)
    if sc is None:
        return color
    kind, atten, payload = sc
    if kind == "pdf":
        pdf = payload
        if scene.lights:
            lp = LightsPdf(best["p"], scene.lights)
            # MixturePdf.generate (mixture.rs:27-33): 0.5/0.5 select
            direction = (lp.generate(rng) if rng.uniform() < 0.5
                         else pdf.generate(rng))
            p_mat = pdf.value(direction)
            p_mix = 0.5 * lp.value(direction) + 0.5 * p_mat
            coef = atten * (p_mat / p_mix if p_mix > 0 else 0.0)
        else:
            direction = pdf.generate(rng)
            coef = atten
    else:
        direction = payload
        coef = atten
    if not np.any(coef):
        return color
    child = ray_color(scene, best["p"], direction, depth - 1, rng)
    return color + coef * child


class OracleCamera:
    """camera.rs:77-129 (thin lens; aperture 0 supported)."""

    def __init__(self, look_from, look_at, vfov, aspect, up=(0, 1, 0),
                 aperture=0.0, focus_dist=None, ):
        look_from = np.asarray(look_from, np.float64)
        look_at = np.asarray(look_at, np.float64)
        theta = vfov * math.pi / 180.0
        h = math.tan(theta / 2)
        vh = 2.0 * h
        vw = aspect * vh
        w = _unit(look_from - look_at)
        u = _unit(np.cross(np.asarray(up, np.float64), w))
        v = _unit(np.cross(w, u))
        fd = (focus_dist if focus_dist is not None
              else np.linalg.norm(look_from - look_at))
        self.origin = look_from
        self.horizontal = u * (fd * vw)
        self.vertical = v * (fd * vh)
        self.lower_left = (look_from - self.horizontal / 2
                           - self.vertical / 2 - w * fd)
        self.u, self.v = u, v
        self.lens_radius = aperture / 2

    def get_ray(self, s, t, rng):
        if self.lens_radius > 0:
            r = math.sqrt(rng.uniform()) * self.lens_radius
            th = rng.uniform(0, 2 * math.pi)
            offset = self.u * (r * math.cos(th)) + self.v * (r * math.sin(th))
        else:
            offset = 0.0
        source = self.origin + offset
        target = (self.lower_left + self.horizontal * s + self.vertical * t)
        return source, _unit(target - source)


def render(scene, camera, width, height, spp, max_depth, seed=0):
    """(H, W, 3) mean radiance, top image row first (the reference
    iterates iproduct!((0..h).rev(), 0..w), renderer.rs:94-122)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((height, width, 3))
    for r in range(height):
        j = height - 1 - r
        for i in range(width):
            acc = np.zeros(3)
            for _ in range(spp):
                s = (i + rng.uniform() - 0.5) / width
                t = (j + rng.uniform() - 0.5) / height
                ro, rd = camera.get_ray(s, t, rng)
                acc += ray_color(scene, ro, rd, max_depth, rng)
            img[r, i] = acc / spp
    return img
