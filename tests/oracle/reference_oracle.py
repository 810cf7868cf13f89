"""Independent scalar oracle: a direct NumPy port of the reference integrator.

This is a SEPARATE code path from path_tracer_tpu — it shares no code with
the wavefront renderer (its own ISF parsing, its own intersection, BRDF and
light sampling) and mirrors the reference's per-pixel recursive structure
instead of the wavefront SoA design, so a wrong constant in the framework
cannot leak into the goldens it produces.

Structure mirrors (behavioral spec, not a code copy):
  - render loop / camera gen      ref: src/renderer/mod.rs:105-124
  - render_pixel + alpha walk     ref: src/renderer/mod.rs:171-228
  - compute_radiance              ref: src/renderer/mod.rs:230-278
  - get_light_info (incl. the original-UV-with-occluder-material point-light
    quirk at mod.rs:324)          ref: src/renderer/mod.rs:280-333
  - ray_cast all-hits-sorted      ref: src/renderer/utils.rs:11-21
  - russian roulette              ref: src/renderer/utils.rs:23-31
  - Cook-Torrance BRDF            ref: src/renderer/brdf/cook_torrance.rs
  - sphere/mesh intersection      ref: src/scene/internal/model.rs:24-74,
                                       triangle.rs:37-81
  - hit interpolation / TBN       ref: src/renderer/hit.rs:55-138
  - material sampling             ref: src/scene/internal/material.rs:115-219
  - tonemaps + gamma + u8         ref: src/renderer/tonemap.rs, mod.rs:335-353
  - ISF serde defaults            ref: src/scene/isf.rs (incl. the
    absent-metalness=0 / present-without-factor=1 quirk)

RNG: numpy PCG64 seeded per (pixel, sample) with the reference's
`sample + i * samples` counter structure (mod.rs:110-112). The bitstream
differs from Rust StdRng, so comparisons are at converged sample counts with
tolerances, never bit-exact.

PRECISION: the GEOMETRY pipeline (ray/hit positions, sphere quadratic, MT,
the 1e-5 bias) runs in float32 like the Rust reference. This is not
pedantry: at grazing sphere hits the f32 position error (ulp of t ~ 24)
exceeds the 1e-5 normal bias, so shadow rays spuriously self-hit — real,
deterministic shadow acne in the reference that shifts converged rim-pixel
values by several percent. A float64 oracle has no acne and systematically
over-brightens sphere rims relative to every f32 implementation. Smooth
quantities (BRDF eval, light falloff) may promote to f64 freely — only the
discontinuous accept/reject decisions must be f32.
"""
from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

DET_EPS = 1e-6
DIST_EPS = 1e-6
NORMAL_BIAS = 1e-5
PI = math.pi

# Rec.709 luma used by the Rust image crate's into_luma8 (spec constant,
# shared with utils/image_io.py by necessity).
LUMA = (0.2126, 0.7152, 0.0722)


# ---------------------------------------------------------------------------
# Scene model (independent ISF parsing)
# ---------------------------------------------------------------------------


@dataclass
class OChannel3:
    factor: np.ndarray  # [3]
    texture: Optional[np.ndarray] = None  # [H,W,3] uint8


@dataclass
class OChannel1:
    factor: float
    texture: Optional[np.ndarray] = None  # [H,W] uint8


@dataclass
class OMaterial:
    albedo: OChannel3
    emissive: OChannel3
    opacity: OChannel1
    metalness: OChannel1
    roughness: OChannel1
    ior: float
    normal_texture: Optional[np.ndarray] = None  # [H,W,3] uint8


@dataclass
class OMesh:
    v: np.ndarray  # [T,3,3] vertex positions
    n: np.ndarray  # [T,3,3] vertex normals
    uv: np.ndarray  # [T,3,2]
    material: OMaterial = None
    # Precomputed MT inputs
    e1: np.ndarray = field(default=None)
    e2: np.ndarray = field(default=None)

    def __post_init__(self):
        self.e1 = self.v[:, 1] - self.v[:, 0]
        self.e2 = self.v[:, 2] - self.v[:, 0]


@dataclass
class OSphere:
    center: np.ndarray
    radius: float
    material: OMaterial = None


@dataclass
class OLight:
    kind: str  # "Point" | "Directional"
    color: np.ndarray
    position: Optional[np.ndarray] = None
    direction: Optional[np.ndarray] = None


@dataclass
class OScene:
    models: list
    lights: list
    background: np.ndarray
    cam_matrix: np.ndarray  # [4,4] row-major (M[row,col])
    fov: float


def _load_rgb(path: Path) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    return np.asarray(img.convert("RGB"), np.uint8)


def _load_gray(path: Path) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode == "L":
        return np.asarray(img, np.uint8)
    rgb = np.asarray(img.convert("RGB"), np.float64)
    luma = LUMA[0] * rgb[..., 0] + LUMA[1] * rgb[..., 1] + LUMA[2] * rgb[..., 2]
    return np.floor(luma + 0.5).clip(0, 255).astype(np.uint8)


def _chan3(d: dict, key: str, absent_factor) -> OChannel3:
    # serde: absent key -> derived Default (factor = absent_factor);
    # present without "factor" -> the serde default fn = [1,1,1].
    sub = d.get(key)
    if sub is None:
        return OChannel3(np.array(absent_factor, np.float64), None)
    factor = np.array(sub.get("factor", [1.0, 1.0, 1.0]), np.float64)
    return OChannel3(factor, sub.get("texture"))


def _chan1(d: dict, key: str, absent_factor: float) -> OChannel1:
    sub = d.get(key)
    if sub is None:
        return OChannel1(float(absent_factor), None)
    return OChannel1(float(sub.get("factor", 1.0)), sub.get("texture"))


def load_oracle_scene(path) -> OScene:
    path = Path(path)
    data = json.loads(path.read_text())
    root = path.parent

    def material(md: dict) -> OMaterial:
        m = OMaterial(
            albedo=_chan3(md, "albedo", [1.0, 1.0, 1.0]),
            emissive=_chan3(md, "emissive", [0.0, 0.0, 0.0]),
            opacity=_chan1(md, "opacity", 1.0),
            # The quirk: absent metalness key -> f32 default 0.0, but a
            # present metalness object without factor -> serde default 1.0.
            metalness=_chan1(md, "metalness", 0.0),
            roughness=_chan1(md, "roughness", 1.0),
            ior=float(md.get("ior", 1.0)),
            normal_texture=md.get("normal_texture"),
        )
        for ch in (m.albedo, m.emissive):
            if isinstance(ch.texture, str):
                ch.texture = _load_rgb(root / ch.texture)
        for ch in (m.opacity, m.metalness, m.roughness):
            if isinstance(ch.texture, str):
                ch.texture = _load_gray(root / ch.texture)
        if isinstance(m.normal_texture, str):
            m.normal_texture = _load_rgb(root / m.normal_texture)
        return m

    models = []
    for md in data["models"]:
        mat = material(md["material"])
        if md["type"] == "Sphere":
            models.append(OSphere(np.array(md["center"], np.float32),
                                  float(md["radius"]), mat))
        else:
            tris = md["triangles"]
            v = np.array([[t[i]["position"] for i in range(3)] for t in tris],
                         np.float32)
            n = np.array([[t[i]["normal"] for i in range(3)] for t in tris],
                         np.float32)
            uv = np.array(
                [[t[i]["tex_coords"] for i in range(3)] for t in tris],
                np.float32)
            models.append(OMesh(v, n, uv, mat))

    lights = []
    for ld in data["lights"]:
        if ld["type"] == "Point":
            lights.append(OLight("Point", np.array(ld["color"], np.float32),
                                 position=np.array(ld["position"],
                                                   np.float32)))
        else:
            lights.append(OLight("Directional",
                                 np.array(ld["color"], np.float32),
                                 direction=np.array(ld["direction"],
                                                    np.float32)))

    # cgmath Matrix4 from [[f;4];4] is COLUMN-major: json[col][row].
    t = np.array(data["camera"]["transform"], np.float32)
    cam = t.T

    return OScene(models, lights,
                  np.array(data["background"], np.float64), cam,
                  float(data["camera"]["fov"]))


# ---------------------------------------------------------------------------
# Intersection (all hits, sorted)
# ---------------------------------------------------------------------------


@dataclass
class OHit:
    dist: float
    position: np.ndarray
    normal: np.ndarray  # interpolated, NOT renormalized (triangles)
    model: object
    is_sphere: bool
    uv: Optional[np.ndarray] = None
    tangent: Optional[np.ndarray] = None
    is_backface: bool = False


def _intersect_sphere(m: OSphere, o, d):
    oc = o - m.center
    a = d @ d
    b = 2.0 * (oc @ d)
    c = oc @ oc - m.radius * m.radius
    disc = b * b - 4.0 * a * c
    if disc < 0.0:
        return []
    sq = np.float32(np.sqrt(disc))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    if t2 < 0.0:
        return []
    p2 = o + d * t2
    n2 = p2 - m.center
    n2 = -(n2 / np.linalg.norm(n2))  # far hit: inside-facing normal
    h2 = OHit(float(np.linalg.norm(p2 - o)), p2, n2, m, True)
    if t1 < 0.0:
        return [h2]
    p1 = o + d * t1
    n1 = p1 - m.center
    n1 = n1 / np.linalg.norm(n1)
    h1 = OHit(float(np.linalg.norm(p1 - o)), p1, n1, m, True)
    return [h1, h2]


def _intersect_mesh(m: OMesh, o, d):
    pvec = np.cross(np.broadcast_to(d, m.e2.shape), m.e2)
    det = np.einsum("ij,ij->i", m.e1, pvec)
    ok = np.abs(det) >= DET_EPS
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o - m.v[:, 0]
    u = np.einsum("ij,ij->i", tvec, pvec) * inv
    ok &= (u >= 0.0) & (u <= 1.0)
    qvec = np.cross(tvec, m.e1)
    v = (qvec @ d) * inv
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = np.einsum("ij,ij->i", m.e2, qvec) * inv
    ok &= t >= DIST_EPS
    hits = []
    for i in np.nonzero(ok)[0]:
        ui, vi, ti = u[i], v[i], t[i]
        w0 = 1.0 - ui - vi
        normal = w0 * m.n[i, 0] + ui * m.n[i, 1] + vi * m.n[i, 2]
        uv = m.uv[i, 0] + ui * (m.uv[i, 1] - m.uv[i, 0]) \
            + vi * (m.uv[i, 2] - m.uv[i, 0])
        duv1 = m.uv[i, 1] - m.uv[i, 0]
        duv2 = m.uv[i, 2] - m.uv[i, 0]
        denom = duv1[0] * duv2[1] - duv2[0] * duv1[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / denom if denom != 0.0 else math.inf
            tangent = f * (duv2[1] * m.e1[i] - duv1[1] * m.e2[i])
            nrm = np.linalg.norm(tangent)
            tangent = tangent / nrm if nrm > 0 else tangent * math.nan
        hits.append(OHit(float(ti), o + d * ti, normal, m, False,
                         uv=uv, tangent=tangent, is_backface=det[i] < 0.0))
    return hits


def ray_cast(scene: OScene, o, d):
    hits = []
    for m in scene.models:
        if isinstance(m, OSphere):
            hits.extend(_intersect_sphere(m, o, d))
        else:
            hits.extend(_intersect_mesh(m, o, d))
    hits.sort(key=lambda h: h.dist)
    return hits


# ---------------------------------------------------------------------------
# Material sampling
# ---------------------------------------------------------------------------


def _fetch(tex: np.ndarray, uv):
    h, w = tex.shape[:2]
    # Rust: (coords as i64).rem_euclid(size) — f32->i64 truncates toward 0.
    x = int(np.trunc(uv[0] * w)) % w
    y = int(np.trunc(uv[1] * h)) % h
    return tex[y, x]


@dataclass
class OMaterialSample:
    metalness: float
    roughness: float
    albedo: np.ndarray
    opacity: float
    emissive: np.ndarray
    ior: float


def material_sample(mat: OMaterial, uv, simple: bool) -> OMaterialSample:
    if simple or uv is None:
        albedo = mat.albedo.factor
        emissive = mat.emissive.factor
        opacity = mat.opacity.factor
        metalness = mat.metalness.factor
        roughness = mat.roughness.factor
    else:
        if mat.albedo.texture is not None:
            px = _fetch(mat.albedo.texture, uv).astype(np.float64)
            albedo = (px / 255.0) ** 2.2 * mat.albedo.factor
        else:
            albedo = mat.albedo.factor
        if mat.emissive.texture is not None:
            px = _fetch(mat.emissive.texture, uv).astype(np.float64)
            emissive = px / 255.0 * mat.emissive.factor  # NOT linearized
        else:
            emissive = mat.emissive.factor
        opacity = (float(_fetch(mat.opacity.texture, uv)) / 255.0
                   * mat.opacity.factor
                   if mat.opacity.texture is not None else mat.opacity.factor)
        metalness = (float(_fetch(mat.metalness.texture, uv)) / 255.0
                     * mat.metalness.factor
                     if mat.metalness.texture is not None
                     else mat.metalness.factor)
        roughness = (float(_fetch(mat.roughness.texture, uv)) / 255.0
                     * mat.roughness.factor
                     if mat.roughness.texture is not None
                     else mat.roughness.factor)
    return OMaterialSample(metalness, max(roughness, 1e-4), albedo, opacity,
                           emissive, mat.ior)


def hit_material_sample(hit: OHit, mat: OMaterial) -> OMaterialSample:
    """hit.get_material_sample(model): simple factors for spheres, textured
    fetch at the hit's UV for triangles (ref hit.rs:84-94)."""
    return material_sample(mat, hit.uv, simple=hit.is_sphere)


def hit_shading_normal(hit: OHit) -> np.ndarray:
    if hit.is_sphere:
        return hit.normal
    mat = hit.model.material
    if mat.normal_texture is not None:
        px = _fetch(mat.normal_texture, hit.uv).astype(np.float64)
        nm = px / 127.5 - 1.0
        bitangent = np.cross(hit.normal, hit.tangent)
        world = hit.tangent * nm[0] + bitangent * nm[1] + hit.normal * nm[2]
        normal = world / np.linalg.norm(world)
    else:
        normal = hit.normal
    return -normal if hit.is_backface else normal


# ---------------------------------------------------------------------------
# Cook-Torrance BRDF
# ---------------------------------------------------------------------------


def _transform_to_world(vec, n):
    if abs(n[0]) > abs(n[1]):
        nt = np.array([n[2], 0.0, -n[0]]) / math.sqrt(n[0] ** 2 + n[2] ** 2)
    else:
        nt = np.array([0.0, -n[2], n[1]]) / math.sqrt(n[1] ** 2 + n[2] ** 2)
    nb = np.cross(n, nt)
    return vec[0] * nb + vec[1] * n + vec[2] * nt


def _reflection(i, n):
    return 2.0 * max(i @ n, 0.0) * n - i


class OCookTorrance:
    def __init__(self, ms: OMaterialSample):
        self.metalness = ms.metalness
        self.roughness = ms.roughness
        self.albedo = ms.albedo
        self.emissive = ms.emissive
        self.f0 = np.full(3, 0.04) * (1.0 - ms.metalness) \
            + ms.albedo * ms.metalness
        self.wm = np.zeros(3)

    def sample(self, n, v, rng):
        a = self.roughness * self.roughness
        a2 = a * a
        r1 = rng.random()
        r2 = rng.random()
        theta = math.acos(math.sqrt((1.0 - r1) / (r1 * (a2 - 1.0) + 1.0)))
        phi = 2.0 * PI * r2
        st = math.sin(theta)
        local = np.array([st * math.cos(phi), math.cos(theta),
                          st * math.sin(phi)])
        local = local / np.linalg.norm(local)
        wm = _transform_to_world(local, n)
        self.wm = wm / np.linalg.norm(wm)
        d = _reflection(v, self.wm)
        return d / np.linalg.norm(d)

    def _fresnel(self, cos_theta):
        return self.f0 + (1.0 - self.f0) * (1.0 - cos_theta) ** 5

    def _geom_smith(self, n, v, l):
        k = (self.roughness + 1.0) ** 2 / 8.0
        ndv = max(n @ v, 0.0)
        ndl = max(n @ l, 0.0)
        g1 = ndv / (ndv * (1.0 - k) + k)
        g2 = ndl / (ndl * (1.0 - k) + k)
        return g1 * g2

    def _ndf_ggx(self, n, h):
        a = self.roughness * self.roughness
        a2 = a * a
        ndh = max(n @ h, 0.0)
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        return a2 / (PI * denom * denom)

    def _diffuse(self, ks, n, l):
        kd = (1.0 - ks) * (1.0 - self.metalness)
        return kd * self.albedo / PI * max(n @ l, 0.0)

    @staticmethod
    def _halfway(v, l):
        """normalize(v + l) with the degenerate case pinned to the benign
        f32 arm.

        When sample() degenerates to l == -v (v.wm < 0 makes reflection()
        return -v, ref utils.rs:34-36), the reference computes
        normalize(v + l) on a vector whose f32 components are 0 +/- 1 ulp:
        depending on rounding this is either NaN (a black pixel) or a unit
        vector parallel to +/-v — and in BOTH non-NaN roundings the final
        eval_indirect value is exactly 0 (spec is below-horizon, the diffuse
        cosine is 0). We pin the zero-halfway case to h = 0 (giving f = 1,
        kd = 0, hence 0 contribution), matching the wavefront renderer
        (ops/brdf.py _normalize) and the reference's benign arm; the NaN arm
        is unmatchable stochastic garbage.
        """
        h = v + l
        nrm = np.linalg.norm(h)
        return h / nrm if nrm > 0.0 else np.zeros(3)

    def eval_direct(self, n, v, l):
        h = self._halfway(v, l)
        d = self._ndf_ggx(n, h)
        f = self._fresnel(max(h @ v, 0.0))
        g = self._geom_smith(n, v, l)
        spec = (d * f * g) / max(4.0 * max(n @ v, 0.0) * max(n @ l, 0.0),
                                 1e-4)
        spec = spec * max(n @ l, 0.0)
        return self._diffuse(f, n, l) + spec + self.emissive

    def eval_indirect(self, n, v, l):
        h = self._halfway(v, l)
        f = self._fresnel(max(h @ v, 0.0))
        g = self._geom_smith(n, v, l)
        if n @ l > 0.0:
            num = abs(v @ self.wm)
            denom = abs(v @ n) * abs(self.wm @ n)
            spec = f * g * (num / denom)
        else:
            spec = np.zeros(3)
        return self._diffuse(f, n, l) + spec

    def pdf(self):
        return 1.0


# ---------------------------------------------------------------------------
# Integrator
# ---------------------------------------------------------------------------


def _get_light_info(scene: OScene, light: OLight, hit: OHit):
    geom_n = hit.normal
    if light.kind == "Directional":
        o = hit.position + geom_n * NORMAL_BIAS
        d = -light.direction
        color = light.color.copy()
        for sh in ray_cast(scene, o, d):
            ms = hit_material_sample(sh, sh.model.material)
            color = color * (1.0 - ms.opacity)
            if color.sum() == 0.0:
                break
        return color, light.direction
    # Point
    direction = hit.position - light.position
    dist = float(np.linalg.norm(direction))
    direction = direction / dist
    o = hit.position + geom_n * NORMAL_BIAS
    d = -direction
    dissipated = light.color / (4.0 * PI * dist * dist)
    for sh in ray_cast(scene, o, d):
        if np.linalg.norm(sh.position - hit.position) > dist:
            break  # occluder behind the light
        # The quirk (mod.rs:324): ORIGINAL hit's UV with occluder's material.
        ms = hit_material_sample(hit, sh.model.material)
        dissipated = dissipated * (1.0 - ms.opacity)
        if dissipated.sum() == 0.0:
            break
    return dissipated, direction


def render_pixel(scene: OScene, bounces: int, o, d, rng):
    color = np.zeros(3)
    throughput = np.ones(3)
    for bounce in range(bounces + 1):
        hits = ray_cast(scene, o, d)
        if not hits:
            return color + throughput * scene.background

        surface = None
        for hit in hits:
            ms = hit_material_sample(hit, hit.model.material)
            normal = hit_shading_normal(hit)
            surface = (hit, ms, normal)
            op = ms.opacity
            if op >= 1.0 or (op > 0.001 and rng.random() < op):
                break

        hit, ms, normal = surface
        view = -d
        brdf = OCookTorrance(ms)
        color = color + throughput * ms.emissive
        for light in scene.lights:
            lr, ldir = _get_light_info(scene, light, hit)
            if not lr.any():
                continue
            color = color + throughput * brdf.eval_direct(normal, view,
                                                          -ldir) * lr
        if bounce < bounces:
            new_d = brdf.sample(normal, view, rng)
            # f32 origin + bias: the acne statistics depend on this (see
            # PRECISION note).
            o = (hit.position + hit.normal * NORMAL_BIAS).astype(np.float32)
            d = new_d.astype(np.float32)
            throughput = throughput * brdf.eval_indirect(normal, view, new_d) \
                / brdf.pdf()

        if throughput @ throughput < 1e-5:
            return color
        if bounce > 3:
            p = float(throughput.max())
            throughput = throughput / p
            if rng.random() > p:
                return color
    return color


def oracle_render(scene: OScene, width: int, height: int, samples: int,
                  bounces: int, rows=None, progress=False) -> np.ndarray:
    """Mean radiance [H,W,3] float64 (pre-tonemap), reference loop structure.

    ``rows`` optionally restricts to a subset of scanlines (for
    multiprocessing); returned array still has full height with zeros
    elsewhere.
    """
    cam = scene.cam_matrix
    cam_pos = cam[:3, 3]
    rot = cam[:3, :3]
    tanf = math.tan(scene.fov / 2.0)
    aspect = width / height
    buf = np.zeros((height, width, 3))
    row_iter = range(height) if rows is None else rows
    for y in row_iter:
        if progress:
            print(f"  row {y}/{height}", end="\r", flush=True)
        for x in range(width):
            i = x + y * width
            acc = np.zeros(3)
            for s in range(1, samples + 1):
                rng = np.random.Generator(
                    np.random.PCG64(s + i * samples))
                sx = (x + rng.random()) / width * 2.0 - 1.0
                sx *= tanf * aspect
                sy = 1.0 - (y + rng.random()) / height * 2.0
                sy *= tanf
                # f32 geometry pipeline (see PRECISION note in module doc).
                d = np.array([sx, sy, -1.0], np.float32)
                d = d / np.float32(np.linalg.norm(d))
                d = rot @ d
                acc += render_pixel(scene, bounces, cam_pos.copy(), d, rng)
            buf[y, x] = acc / samples
    return buf


# ---------------------------------------------------------------------------
# Post-processing (tonemap + gamma + u8)
# ---------------------------------------------------------------------------


def tonemap(kind: str, c: np.ndarray) -> np.ndarray:
    if kind == "REINHARD":
        return c / (c + 1.0)
    if kind == "FILMIC":
        c = np.maximum(c - 0.004, 0.0)
        return (c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)
    if kind == "ACES":
        res = (c * (2.51 * c + 0.03)) / (c * (2.43 * c + 0.59) + 0.14)
        return np.clip(res, 0.0, 1.0)
    raise ValueError(kind)


def post_process(kind: str, radiance: np.ndarray) -> np.ndarray:
    c = tonemap(kind, radiance)
    c = np.maximum(c, 0.0) ** (1.0 / 2.2)
    return np.clip(c * 255.0, 0, 255).astype(np.uint8)  # truncating cast
