"""Scene compiler: object graph -> flat SoA device tables.

This is the framework's "graph builder".  The reference keeps the scene as a
Python list of collider objects and loops over them per ray bundle
(sightpy/ray.py:124); on TPU that structure cannot be traced.  Instead the
scene is lowered once into:

* `SceneData`   — a pytree of jnp arrays (geometry tables per primitive type,
  per-object attribute tables, material parameter tables, light tables,
  textures).  Pure data: changing it (e.g. animation) does NOT retrigger
  compilation of the render function.
* `SceneStatic` — a small hashable dataclass of structural facts (counts,
  which material types exist, which slots use image textures, ...).  It is a
  static jit argument: two scenes with the same structure share one XLA
  executable.

Object-id layout (shared with geometry/intersect.py and geometry/attrs.py):
spheres, then planes, then boxes, then triangles, in insertion order within
each type.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..backgrounds.environment import Panorama, SkyBox
from ..lights import DirectionalLight, PointLight, SpotLight
from ..geometry.primitive import (Cuboid, Cylinder, Disc, MeshInstances,
                                  Plane, Primitive, Sphere, Triangle,
                                  TriangleMesh)
from ..materials.base import (MAT_CUSTOM, MAT_DIFFUSE, MAT_EMISSIVE, MAT_ENV,
                              MAT_GLOSSY, MAT_REFRACTIVE, MAT_THINFILM)
from ..textures.texture import image as image_texture
from ..textures.texture import solid_color

F32 = np.float32
I32 = np.int32


# Tables are built as HOST numpy arrays and shipped to the device in ONE
# packed transfer per dtype (_to_device below): issuing ~45 individual
# host->device copies costs hundreds of ms each through a remote-attached
# TPU, turning every render call into seconds of pure transfer latency.
def _f(x):
    return np.asarray(x, dtype=F32)


def _i(x):
    return np.asarray(x, dtype=I32)


def _stack3(rows):
    if not rows:
        return np.zeros((0, 3), F32)
    return _f(np.stack(rows))


def _arr1(rows):
    return _f(np.asarray(rows, dtype=F32)) if rows else np.zeros((0,), F32)


def _unpack_specs(specs, **buffers):
    out = []
    offsets = {k: 0 for k in buffers}
    for kind, shape in specs:
        n = int(np.prod(shape)) if shape else 1
        buf = buffers[kind]
        out.append(jax.lax.dynamic_slice(buf, (offsets[kind],), (n,)).reshape(shape))
        offsets[kind] += n
    return out


_unpack_jit = jax.jit(_unpack_specs, static_argnames=("specs",))


# Device cache for texture arrays, keyed by host-array identity: textures are
# the big leaves (an env cubemap is ~150 MB as f32) and scenes reuse the same
# host arrays across render calls — upload each distinct texture once per
# process.  Holding the host array pins its id() against reuse.
_TEX_DEVICE_CACHE = {}


def _texture_to_device(arr):
    """Normalize + upload a texture, cached by the ORIGINAL host array's
    identity (the array stored on the material object, stable across
    compile_scene calls — derived views would get a fresh id each time)."""
    key = id(arr)
    hit = _TEX_DEVICE_CACHE.get(key)
    if hit is None:
        a = np.asarray(arr, dtype=F32)
        if a.ndim == 2:
            a = a[..., None].repeat(3, axis=-1)
        hit = (arr, jnp.asarray(np.ascontiguousarray(a[..., :3])))
        _TEX_DEVICE_CACHE[key] = hit
    return hit[1]


# Packed texture atlas for the record-path replay: XLA's TPU gather costs
# ~13 ns/element regardless of dtype, so fetching an RGB texel as THREE f32
# gathers is 3x the irreducible cost.  Each texture packs to one 32-bit word
# per texel; the replay does ONE gather per fetch round and decodes with VPU
# shifts.  Two encodings, chosen per texture by content:
#   enc 0 — 10-10-10 bits/channel over a per-texture scale.  Quantization
#     error <= scale/2046 — below the 8-bit granularity of LDR source
#     images.
#   enc 1 — RGB9E5 shared-exponent ([e:5][r:9][g:9][b:9], value
#     m * 2^(e-24)) for high-dynamic-range maps (max > E5_PACK_LIMIT): a
#     10-bit global scale over a max-5000 Radiance env steps by ~5 radiance
#     units for EVERY texel, while RGB9E5 keeps each texel's error at
#     <= 2^-9 of its own dominant channel (the same tradeoff as the
#     GL/Vulkan RGB9E5 HDR format).
_TEX_PACKED_CACHE = {}
_ATLAS_CACHE = {}

E5_PACK_LIMIT = 4.0     # max value above which a texture packs as RGB9E5
_E5_BIAS = 15           # exponent bias; value = m * 2^(e - _E5_BIAS - 9)


def _pack_e5(a):
    """(H, W, 3) f32 >= 0 -> (H, W) int32 RGB9E5 words."""
    a = np.clip(a, 0.0, (511.0 / 512.0) * 2.0 ** 16)
    maxc = np.maximum(a.max(axis=-1), 1e-30)
    e = np.clip(np.floor(np.log2(maxc)) + _E5_BIAS + 1, 0, 31).astype(np.uint32)
    denom = np.exp2(e.astype(np.float64) - _E5_BIAS - 9)
    m = np.clip(a / denom[..., None] + 0.5, 0, 511).astype(np.uint32)
    return ((e << 27) | (m[..., 0] << 18) | (m[..., 1] << 9)
            | m[..., 2]).view(np.int32)


def _texture_packed(arr):
    key = id(arr)
    hit = _TEX_PACKED_CACHE.get(key)
    if hit is None:
        a = np.asarray(arr, dtype=F32)
        if a.ndim == 2:
            a = a[..., None].repeat(3, axis=-1)
        a = np.ascontiguousarray(a[..., :3])
        amax = float(np.max(a)) if a.size else 1.0
        if amax > E5_PACK_LIMIT:
            packed, scale, enc = _pack_e5(a), 1.0, 1
        else:
            scale, enc = float(max(1.0, amax)), 0
            q = np.clip(a / scale * 1023.0 + 0.5, 0.0, 1023.0).astype(np.uint32)
            packed = ((q[..., 0] << 20) | (q[..., 1] << 10)
                      | q[..., 2]).astype(np.int32)
        hit = (arr, jnp.asarray(packed.reshape(-1)), scale,
               (int(a.shape[0]), int(a.shape[1])), enc)
        _TEX_PACKED_CACHE[key] = hit
    return hit[1], hit[2], hit[3], hit[4]


def _texture_atlas(arrs):
    """(atlas (total,) int32 device array, scales (T,) f32, shapes, offsets,
    encodings) — encodings[t] is 0 (10-10-10 x scale) or 1 (RGB9E5)."""
    key = tuple(id(a) for a in arrs)
    hit = _ATLAS_CACHE.get(key)
    if hit is None:
        parts, scales, shapes, offsets, encs = [], [], [], [], []
        off = 0
        for a in arrs:
            p, s, shp, enc = _texture_packed(a)
            parts.append(p)
            scales.append(s)
            shapes.append(shp)
            offsets.append(off)
            encs.append(enc)
            off += shp[0] * shp[1]
        atlas = (jnp.concatenate(parts) if parts
                 else jnp.zeros((1,), jnp.int32))
        hit = (arrs, atlas, np.asarray(scales or [1.0], F32),
               tuple(shapes), tuple(offsets), tuple(encs))
        _ATLAS_CACHE[key] = hit
    return hit[1], hit[2], hit[3], hit[4], hit[5]


_ATLAS_QUAD_CACHE = {}


def _texture_atlas_quad(arrs):
    """(total, 4) int32 QUAD atlas: row t of a texture (H, W) holds the four
    bilinear taps of storage texel t=(r, c) —
    [w(r,c), w(r,(c+1)%W), w((r-1)%H,c), w((r-1)%H,(c+1)%W)] —
    in Round.fetch's tap order ((dx,dy) taps with col=(ix+dx)%W,
    row=(-(iy+dy))%H: the dy=1 tap is storage row MINUS one, wrapped).

    One gather ROW per bilinear fetch instead of four: the TPU gather
    engine charges ~13 ns per row regardless of width <= 16 words
    (scripts/probe_gather.py), so 4-word rows cost the same as 1-word rows
    and the bilinear replay round drops to 1/4 of its gather rows
    (VERDICT r4 #6; hardware A/B in scripts/probe_quad_rows.py).  Built
    on-device from the already-uploaded packed words (jnp.roll) — no extra
    H2D; 4x atlas memory, only materialized when the scene has a bilinear
    texture."""
    key = tuple(id(a) for a in arrs)
    hit = _ATLAS_QUAD_CACHE.get(key)
    if hit is None:
        parts = []
        for a in arrs:
            p, _s, (H, W), _enc = _texture_packed(a)
            A = jnp.reshape(p, (H, W))
            q0 = A
            q1 = jnp.roll(A, -1, axis=1)
            q2 = jnp.roll(A, 1, axis=0)
            q3 = jnp.roll(q2, -1, axis=1)
            parts.append(jnp.stack([q0, q1, q2, q3], axis=-1).reshape(-1, 4))
        quad = (jnp.concatenate(parts) if parts
                else jnp.zeros((1, 4), jnp.int32))
        hit = (arrs, quad)
        _ATLAS_QUAD_CACHE[key] = hit
    return hit[1]


# Environment importance sampling: alias tables over an equirect map's
# luminance, cached per source array (HDR envs are the big win — the
# reference has no way to importance-sample an environment at all).
_ENV_IS_CACHE = {}


def _build_alias(mass):
    """Walker alias tables for the discrete distribution `mass` (host)."""
    n = mass.shape[0]
    p = mass / max(mass.sum(), 1e-30) * n
    alias = np.arange(n, dtype=I32)
    prob = np.ones(n, F32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    return prob, alias


def _env_is_tables(arr, max_h=128, max_w=256):
    """(prob, alias, pdf_table, (Hs, Ws)) for equirect env sampling.

    Cells are a uniform (Hs, Ws) grid over the (u, v) square in the SAME
    convention the env fetch uses (sphere uv + fetch_texture's negated-row
    indexing, materials/shade.py fetch_texture): cell mass pools the source
    texels' luminance x solid angle; pdf_table is the normalized mass over
    the cell's EXACT solid angle, so pdf(d) is exact for the sampler
    regardless of pooling (pooling shifts only efficiency, never bias).
    """
    key = id(arr)
    hit = _ENV_IS_CACHE.get(key)
    if hit is not None:
        return hit[1]
    a = np.asarray(arr, np.float64)
    H, W = a.shape[0], a.shape[1]
    lum = a[..., :3].mean(-1) if a.ndim == 3 else a
    # v-index convention: v in [iv/H, (iv+1)/H) fetches row (-iv) mod H
    lum_v = lum[(-np.arange(H)) % H]
    # per source texel solid angle: band in sin(elevation) x 2pi/W
    sl = -np.cos(np.pi * np.arange(H + 1) / H)
    w_tex = (sl[1:] - sl[:-1]) * (2.0 * np.pi / W)          # (H,)
    Hs, Ws = min(H, max_h), min(W, max_w)
    rowmap = np.arange(H) * Hs // H
    colmap = np.arange(W) * Ws // W
    mass = np.zeros((Hs, Ws))
    np.add.at(mass, (rowmap[:, None], colmap[None, :]), lum_v * w_tex[:, None])
    # exact solid angle of each (uniform) sampling cell
    slc = -np.cos(np.pi * np.arange(Hs + 1) / Hs)
    w_cell = (slc[1:] - slc[:-1])[:, None] * (2.0 * np.pi / Ws)   # (Hs, 1)
    total = max(mass.sum(), 1e-30)
    pdf = (mass / total) / w_cell
    prob, alias = _build_alias(mass.reshape(-1))
    out = (prob, alias, pdf.reshape(-1).astype(F32), (Hs, Ws))
    _ENV_IS_CACHE[key] = (arr, out)
    return out


def _to_device(data):
    """Upload a numpy SceneData pytree with one transfer per dtype group.

    Leaves that are already device arrays (cached textures) pass through.
    """
    leaves, treedef = jax.tree_util.tree_flatten(data)
    kinds = []
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            kinds.append("dev")
            continue
        a = np.asarray(leaf)
        if a.dtype == np.bool_:
            kinds.append("b")
        elif np.issubdtype(a.dtype, np.integer):
            kinds.append("i")
        else:
            kinds.append("f")
    specs = tuple((k, (None if k == "dev" else tuple(np.asarray(l).shape)))
                  for k, l in zip(kinds, leaves))
    buffers = {}
    for kind, dt in (("f", F32), ("i", I32), ("b", np.bool_)):
        parts = [np.asarray(l, dtype=dt).ravel()
                 for k, l in zip(kinds, leaves) if k == kind]
        buffers[kind] = (np.concatenate(parts) if parts
                         else np.zeros((1,), dt))
        if buffers[kind].size == 0:
            buffers[kind] = np.zeros((1,), dt)
    packed_specs = tuple(s for s in specs if s[0] != "dev")
    dev_packed = _unpack_jit(packed_specs,
                             **{k: jnp.asarray(v) for k, v in buffers.items()})
    dev_leaves = []
    it = iter(dev_packed)
    for kind, leaf in zip(kinds, leaves):
        dev_leaves.append(leaf if kind == "dev" else next(it))
    return jax.tree_util.tree_unflatten(treedef, dev_leaves)


@jax.tree_util.register_dataclass
@dataclass
class GeometryTables:
    sphere_center: Any
    sphere_radius: Any
    plane_center: Any
    plane_normal: Any
    plane_u_axis: Any
    plane_v_axis: Any
    plane_half_w: Any
    plane_half_h: Any
    plane_uv_shift: Any
    box_basis: Any
    box_center: Any
    box_whl: Any
    box_lb_local: Any
    box_rt_local: Any
    tri_p1: Any
    tri_p2: Any
    tri_p3: Any
    tri_normal: Any
    tri_centroid: Any
    tri_n31: Any
    tri_n12: Any
    tri_n23: Any
    # per-cluster AABBs + start rows for the two-level clustered sweep
    # (empty when n_tris < TRI_CLUSTER_THRESHOLD); triangles are permuted
    # into SAH-BVH leaf order and clustered as fixed TRI_CLUSTER_SIZE runs
    # (see _cluster_runs for the measured negative result on BVH-treelet
    # cuts).  The sweep dynamic-slices TRI_CLUSTER_SIZE rows from `start`.
    tri_cl_lo: Any = None
    tri_cl_hi: Any = None
    tri_cl_start: Any = None
    # per-corner vertex attributes (smooth shading normals / mesh texture
    # coordinates), empty (0, …) unless some TriangleMesh carries them.
    # Rows are permuted into leaf order alongside the vertex tables; flat
    # triangles hold the face normal at every corner and the barycentric
    # identity uvs (0,0)/(1,0)/(0,1), so interpolation reproduces the
    # non-interpolated result exactly for them.
    tri_vn1: Any = None
    tri_vn2: Any = None
    tri_vn3: Any = None
    tri_uv1: Any = None
    tri_uv2: Any = None
    tri_uv3: Any = None
    # normal-mapped meshes: per-triangle uv-aligned tangent (from the uv
    # derivative of the corner uvs), the uv-handedness sign (+1/-1 —
    # mirrored uv islands need B = sign * cross(N, T) or the map's green
    # channel inverts) and the owning normal map's 'tri'-ref slot (-1 =
    # face not normal-mapped); empty unless some mesh registers a normal map
    tri_tan: Any = None
    tri_tan_sign: Any = None
    tri_nm_slot: Any = None
    # mesh instancing (MeshInstances): triangle tables above hold ONE
    # object-space copy per mesh; each instance is a rigid + uniform-scale
    # transform world = R @ (s x) + t.  Cluster records carry the OWNING
    # instance (tri_cl_inst) and the cluster's first VIRTUAL object id
    # (tri_cl_virt; == tri_cl_start when no instances).  Virtual triangle
    # object ids map back to (physical row, instance) via tri_virt_row /
    # tri_virt_inst (empty when the scene has no MeshInstances).
    tri_cl_inst: Any = None
    tri_cl_virt: Any = None
    tri_virt_row: Any = None
    tri_virt_inst: Any = None
    inst_rot: Any = None        # (I, 3, 3) object -> world rotation
    inst_trans: Any = None      # (I, 3)
    inst_inv_scale: Any = None  # (I,) 1 / uniform scale
    # discs / cylinders (beyond the reference's sphere/plane/box/triangle
    # palette).  Scenes containing them render on the jnp wavefront.
    disc_center: Any = None
    disc_normal: Any = None
    disc_u_axis: Any = None
    disc_v_axis: Any = None
    disc_r_out: Any = None
    disc_r_in: Any = None
    cyl_center: Any = None
    cyl_axis: Any = None
    cyl_u_axis: Any = None
    cyl_v_axis: Any = None
    cyl_radius: Any = None
    cyl_half_h: Any = None
    cyl_capped: Any = None      # (M,) f32 0/1


@jax.tree_util.register_dataclass
@dataclass
class ObjectTables:
    mat_type: Any      # (O,) int32
    mat_slot: Any      # (O,) int32 index into the type's material table
    max_depth: Any     # (O,) int32
    mc: Any            # (O,) bool
    shadow: Any        # (O,) bool
    packed: Any        # (O,) int32: type | slot<<3 | min(depth,1023)<<13 | mc<<23 | shadow<<24


PACKED_SLOT_SHIFT = 3
PACKED_DEPTH_SHIFT = 13
PACKED_MC_SHIFT = 23
PACKED_SHADOW_SHIFT = 24


@jax.tree_util.register_dataclass
@dataclass
class MaterialTables:
    diffuse_color: Any
    diffuse_ambient_weight: Any
    glossy_color: Any
    glossy_n_re: Any
    glossy_n_im: Any
    glossy_roughness: Any
    glossy_spec: Any
    glossy_diff: Any
    refr_n_re: Any
    refr_n_im: Any
    refr_dispersive: Any
    tf_thickness: Any
    tf_noise: Any
    emissive_color: Any
    env_light_intensity: Any


@jax.tree_util.register_dataclass
@dataclass
class LightTables:
    dir_l: Any
    dir_color: Any
    point_pos: Any
    point_color: Any
    spot_pos: Any
    spot_dir: Any
    spot_color: Any
    spot_cos_in: Any            # (S,) cos(inner half-angle)
    spot_cos_out: Any           # (S,) cos(outer half-angle)


@jax.tree_util.register_dataclass
@dataclass
class SceneData:
    geom: GeometryTables
    obj: ObjectTables
    mats: MaterialTables
    lights: LightTables
    is_center: Any       # (K, 3) importance-sampled target centers
    is_radius: Any       # (K,)
    textures: Tuple[Any, ...]
    ambient_color: Any   # (3,)
    scene_n_re: Any      # (3,)
    scene_n_im: Any      # (3,)
    pallas_geom: Any = None   # (O, 24) packed per-object geometry params
    tex_atlas: Any = None     # (total,) int32 10-10-10-packed texels
    # (total, 4) int32 quad atlas (the four bilinear taps per texel, one
    # gather row per fetch — _texture_atlas_quad); None unless the scene
    # has a bilinear texture
    tex_atlas_quad: Any = None
    tex_scale: Any = None     # (T,) f32 per-texture decode scale
    # environment importance sampling (alias tables; empty when off)
    env_is_prob: Any = None   # (Hs*Ws,) f32 alias acceptance probabilities
    env_is_alias: Any = None  # (Hs*Ws,) i32 alias partners
    env_is_pdf: Any = None    # (Hs*Ws,) f32 solid-angle pdf per cell


@dataclass(frozen=True)
class TexRef:
    """Static reference to an image texture used by a material slot."""
    slot: int
    tex: int
    repeat: float
    bilinear: bool = False


@dataclass(frozen=True)
class NormalMapRef:
    """Static reference: object `obj` perturbs its normal with texture `tex`."""
    obj: int
    tex: int
    repeat: float
    basis_kind: str    # 'sphere', 'plane', 'box' or 'tri'
    local_id: int      # index into the type's geometry table
    bilinear: bool = False


@dataclass(frozen=True)
class EnvSlot:
    slot: int
    kind: str                    # 'box' | 'sphere'
    tex: int                     # texture index (blurred variant if blur != 0)
    lightmap: Optional[int]      # texture index or None
    # display + light_intensity * lightmap, prebaked on the display grid:
    # the record replay fetches THIS for secondary rays so the whole replay
    # is one gather round (ops/pallas_record.py).  Baking folds the traced
    # light_intensity into texture content — retuning it re-uploads the
    # table (content fingerprint) but never recompiles.
    combined: Optional[int] = None


@dataclass(frozen=True)
class ObjRecord:
    """Static structure of one object — drives fully-unrolled dispatch in the
    Pallas mega-kernel (ops/pallas_trace.py)."""
    kind: str          # 'sphere' | 'plane' | 'box' | 'tri'
    mat_type: int
    mat_slot: int
    max_depth: int
    mc: bool
    shadow: bool
    # axis-aligned plane shortcut: ((n_axis, n_sign), (u_axis, u_sign),
    # (v_axis, v_sign)) when all three frame vectors are exact ±unit axes
    # (the common case for floors/walls — every reference scene's planes).
    # The kernels then select components statically instead of computing
    # three full dot products: ~22 tile-ops per plane test instead of ~48,
    # bit-identical results (x*1, x*(-1) and +0.0 terms are exact).
    # Rotated planes stay on the generic formula.  R5 eqn diet.
    aa: Any = None


@dataclass(frozen=True)
class SceneStatic:
    n_spheres: int
    n_planes: int
    n_boxes: int
    n_tris: int
    n_objects: int
    # discs / cylinders (beyond the reference).  Object-id order: spheres,
    # planes, boxes, discs, cylinders, triangles LAST (the triangle id
    # space is virtual under MeshInstances and must stay at the end).
    n_discs: int
    n_cylinders: int
    n_dir_lights: int
    n_point_lights: int
    n_is_targets: int
    n_spot_lights: int
    mat_types_present: Tuple[int, ...]
    diffuse_tex: Tuple[TexRef, ...]
    glossy_tex: Tuple[TexRef, ...]
    emissive_tex: Tuple[TexRef, ...]
    thinfilm_lut: Tuple[TexRef, ...]     # per thin-film slot: LUT texture
    thinfilm_noise: Tuple[TexRef, ...]   # per thin-film slot: noise texture
    # composed reflectance tables (see _tf_composed; repeat = LUT rows);
    # slots past TF_COMP_LIMIT are absent and replay via two rounds
    thinfilm_comp: Tuple[TexRef, ...]
    env_slots: Tuple[EnvSlot, ...]
    normal_maps: Tuple[NormalMapRef, ...]
    has_shadow_objects: bool
    max_object_depth: int
    needs_uv: bool = True
    obj_records: Tuple[ObjRecord, ...] = ()
    # texture-atlas geometry for the replay's single-gather fetch
    tex_shapes: Tuple[Tuple[int, int], ...] = ()
    tex_offsets: Tuple[int, ...] = ()
    # per-texture atlas encoding: 0 = 10-10-10 x scale, 1 = RGB9E5 (HDR)
    tex_enc: Tuple[int, ...] = ()
    pallas_tex_ok: bool = False
    # the Pallas mega-kernel handles solid-color scenes with modest object
    # counts; textured / env / LUT scenes use the jnp wavefront path
    pallas_ok: bool = False
    # user CustomMaterial instances in slot order; shading dispatch unrolls
    # over them at trace time (instances are static by identity — the jnp
    # wavefront is the only path that can run them).  custom_fp carries each
    # instance's parameter fingerprint into the jit static key so mutating a
    # plain-python shader parameter forces a retrace (not a stale render).
    custom_mats: Tuple[Any, ...] = ()
    custom_fp: Tuple[str, ...] = ()
    # any Refractive(dispersion=True) in the scene: hero-wavelength Snell
    # (shade_refractive on the wavefront; the Pallas kernels unroll it per
    # dispersive slot via refr_disp — r3, no longer a wavefront-only gate)
    has_dispersion: bool = False
    # per-refractive-slot dispersion flags, static so the kernels' unrolled
    # object dispatch emits the hero-wavelength block only where needed
    refr_disp: Tuple[bool, ...] = ()
    # any TriangleMesh with vertex normals / texture coordinates: triangle
    # attrs interpolate the per-corner tables barycentrically (jnp wavefront
    # only — the Pallas kernels shade flat triangles)
    tri_interp: bool = False
    # environment importance sampling: (Hs, Ws) of the alias-table grid,
    # (0, 0) when off.  Such scenes render on the jnp wavefront (the Diffuse
    # mixture gains an env component, materials/shade.py shade_diffuse).
    env_is_shape: Tuple[int, int] = (0, 0)
    # per-thin-film-slot cubic fit (np.polyfit order, highest power first)
    # of the channel-mean film reflectance over cos_i at the material's mean
    # thickness: the record kernel's F-proportional branch-selection
    # probability (ops/pallas_record.py).  Any clipped q is unbiased — the
    # replay weights by F/q — matching F just minimizes variance.
    tf_selp: Tuple[Tuple[float, float, float, float], ...] = ()


def derive_max_bounces(static: "SceneStatic", cap: int = 12) -> int:
    """Exact bounce budget from scene structure — the ONE shared derivation
    used by Scene.render, parallel.render_sharded and ray.get_raycolor (so the
    same scene traces the same path lengths from every entry point).

    Only glossy / refractive / thin-film honour the per-object depth cap
    (reference glossy.py:87, refractive.py:38, thin_film_interference.py:39);
    diffuse ignores it and terminates after 2 diffuse bounces (diffuse.py:22),
    emissive/env are terminal.  The deepest shadeable hit is therefore
    cap + (2 diffuse bounces if Diffuse exists), and shading it needs one
    more loop iteration.
    """
    capped = [r.max_depth for r in static.obj_records
              if r.mat_type in (MAT_GLOSSY, MAT_REFRACTIVE, MAT_THINFILM,
                                MAT_CUSTOM)]
    extra = 3 if MAT_DIFFUSE in static.mat_types_present else 1
    return min(max(capped or [0]) + extra, cap)


def derive_split_k(static: "SceneStatic", cap: int = 3) -> int:
    """Deterministic Fresnel-split levels for this scene (0 = none).

    The reference carries BOTH branches at refractive (mc=False,
    refractive.py:102-110) and thin-film (thin_film_interference.py:75-113)
    hits; the wavefront enumerates 2^k branch patterns as extra samples
    (RenderSettings.split_k).  k is the deepest split-capable recursion,
    capped — deeper splits fall back to stochastic selection.

    Auto-enabled only for Whitted-style scenes (no Diffuse): there the branch
    noise is the dominant (visible) noise source and the 2^k multiplier is
    the reference's own cost model.  In MC path-traced scenes the diffuse fan
    dominates variance, so the single-branch stochastic estimator is kept
    (set Scene.settings.split_k explicitly to force splitting there).

    Past the cap the stochastic fallback is unbiased (branch picked with
    probability p, weighted 1/p), so the capped estimator matches the
    reference's full 2^depth tree IN EXPECTATION for every Whitted scene —
    pinned statistically by tests/test_split_equivalence.py, which compares
    a depth-5 scene at k=3 against the exact k=5 full enumeration.  Raise
    `cap` (or set Scene.settings.split_k) for exact enumeration at any
    depth; the 2^k sample multiplier is the price, exactly as it is for the
    reference.
    """
    if MAT_DIFFUSE in static.mat_types_present:
        return 0
    depths = [r.max_depth for r in static.obj_records
              if r.mat_type in (MAT_REFRACTIVE, MAT_THINFILM) and not r.mc]
    return min(max(depths or [0]), cap)


# largest composed thin-film table (texels): LUT rows x noise texels.
# MEASURED (scripts/probe_gather.py + /tmp/ab_comp interleaved A/B on the
# example4 chunk, TPU v5e 2026-08-19): gathers cost ~13 ns/row on tables
# up to ~8M rows but ~18 ns/row past ~32M, so composing the reference's
# 400x300x300 = 36M-texel table LOSES to the two dependent small-table
# rounds (0.201 s vs 0.149 s per 960k-ray chunk).  Compose only when the
# table stays small — noiseless films (LUT column slice) and small custom
# tables — where one small-table sweep strictly beats two.
TF_COMP_LIMIT = 2_000_000


def _tf_composed(mat):
    """Composed thin-film reflectance table C, or None when too large.

    C[(row * nH + rn) * nW + cn] = lut[row, col(noise[rn, cn])] with
    col(v) = clip(int(thickness + noise_factor * (v - 0.5)), 0, LW-1) —
    EXACTLY the chained noise->LUT fetch both execution paths perform
    (materials/shade.py shade_thinfilm rows/cols), precomposed so the
    record replay resolves a thin-film hit with ONE gather instead of two
    dependent rounds (ops/pallas_record.py).  Cached on the material: the
    table is large (LUT rows x noise texels) and per-compile rebuilds
    would dominate compile_scene.
    """
    lut = np.asarray(mat.lut, np.float32)
    LH, LW = lut.shape[:2]
    key = (id(mat.lut), id(mat.noise_texture), float(mat.thickness),
           float(mat.noise_factor))
    cached = getattr(mat, "_tf_comp_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    if mat.noise_factor == 0.0:
        col = int(np.clip(float(mat.thickness), 0, LW - 1))
        comp = np.ascontiguousarray(lut[:, col:col + 1, :3])   # (LH, 1, 3)
    else:
        noise = np.asarray(mat.noise_texture, np.float32)
        nH, nW = noise.shape[:2]
        if LH * nH * nW > TF_COMP_LIMIT:
            mat._tf_comp_cache = (key, None)
            return None
        th = mat.thickness + mat.noise_factor * (noise - 0.5)
        col = np.clip(th.astype(np.int32), 0, LW - 1)           # (nH, nW)
        comp = lut[:, col, :3].reshape(LH * nH, nW, 3)
    mat._tf_comp_cache = (key, comp)
    return comp


def _env_combined(mat, display):
    """display + light_intensity * lightmap, on the display grid (see
    EnvSlot.combined).  Nearest-resampled when the lightmap grid differs;
    identical to the separate fetches when the grids match (the SkyBox
    blur pipeline always produces matching grids)."""
    key = (id(display), id(mat.lightmap), float(mat.light_intensity))
    cached = getattr(mat, "_env_comb_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    disp = np.asarray(display, np.float32)[..., :3]
    lm = np.asarray(mat.lightmap, np.float32)[..., :3]
    if lm.shape[:2] != disp.shape[:2]:
        ys = np.arange(disp.shape[0]) * lm.shape[0] // disp.shape[0]
        xs = np.arange(disp.shape[1]) * lm.shape[1] // disp.shape[1]
        lm = lm[ys][:, xs]
    out = (disp + np.float32(mat.light_intensity) * lm).astype(np.float32)
    mat._env_comb_cache = (key, out)
    return out


def _tf_sel_poly(m):
    """Branch-selection cubic for a thin-film material (see
    SceneStatic.tf_selp): least-squares fit in cos_i of the channel-mean
    reflectance of the material's OWN LUT (reference PNG, analytic table or
    user array alike) at the mean film thickness."""
    lut = np.asarray(m.lut, np.float64)
    H, W = lut.shape[:2]
    cos = np.linspace(1e-3, 1.0, 256)
    rows = np.clip((cos * H).astype(int), 0, H - 1)
    col = int(np.clip(m.thickness, 0, W - 1))
    F = lut[rows, col, :3].mean(axis=-1)
    return tuple(float(c) for c in np.polyfit(cos, F, 3))


def _custom_param_fp(m) -> str:
    """Parameter fingerprint of a CustomMaterial instance.

    The shader closes over instance attributes at trace time, so in-place
    mutation of a plain-python parameter must invalidate both the scene
    compile cache AND the jit cache (SceneStatic.custom_fp carries this hash
    into the jit static key).  Plain scalars/strings/tuples hash by value;
    arrays and other objects by identity, matching _fp_material's policy."""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    for k in sorted(vars(m)):
        v = vars(m)[k]
        if isinstance(v, (int, float, bool, str, bytes, type(None))) or (
                isinstance(v, tuple)
                and all(isinstance(x, (int, float, bool, str)) for x in v)):
            h.update(f"{k}={v!r};".encode())
        else:
            h.update(f"{k}:{id(v)};".encode())
    return h.hexdigest()


def _fp_material(h, m, up):
    """Hash every material field compile_scene reads into its tables.
    KEEP IN SYNC with _Builder.material_slot / the MaterialTables build."""
    up(str(id(m)).encode())        # slot identity (dedup key)
    if getattr(m, "mat_type", None) == MAT_CUSTOM:
        up(_custom_param_fp(m).encode())
    for tex_attr in ("diff_texture", "texture_color"):
        t = getattr(m, tex_attr, None)
        if isinstance(t, solid_color):
            up(np.asarray(t.color, np.float64).tobytes())
        elif isinstance(t, image_texture):
            up(str(id(t.img)).encode())
            up(np.float64(t.repeat).tobytes())
            up(bytes([getattr(t, "bilinear", False)]))
    for f in ("ambient_weight", "roughness", "spec_coeff", "diff_coeff",
              "thickness", "noise_factor", "light_intensity", "dispersion",
              "importance_sampled"):
        v = getattr(m, f, None)
        if v is not None:
            up(np.float64(v).tobytes())
    n = getattr(m, "n", None)
    if n is not None:
        up(np.asarray(n, np.complex128).tobytes())
    for arr_attr in ("lut", "noise_texture", "texture", "blur_texture",
                     "lightmap", "normalmap"):
        a = getattr(m, arr_attr, None)
        if a is not None:
            up(str(id(a)).encode())
    if getattr(m, "normalmap", None) is not None:
        up(np.float64(m.normalmap_repeat).tobytes())


def scene_fingerprint(scene) -> bytes:
    """Content hash of every input compile_scene reads — geometry, material
    parameters, lights, importance targets, ambient/medium.  Two scenes with
    equal fingerprints compile to identical (static, data).  In-place
    mutation (prim.rotate, moving a center, editing a material field)
    changes the fingerprint, so compile_scene_cached can never serve stale
    tables.  KEEP IN SYNC with _Builder.add_primitive."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    up = h.update

    def arr(a):
        up(np.ascontiguousarray(np.asarray(a, np.float64)).tobytes())

    for prim in scene.scene_primitives:
        up(type(prim).__name__.encode())
        m = getattr(prim, "material", None)
        if m is not None:
            _fp_material(h, m, up)
        up(bytes([getattr(prim, "mc", False), getattr(prim, "shadow", True)]))
        up(np.int64(getattr(prim, "max_ray_depth", 0)).tobytes())
        if isinstance(prim, (Sphere, Panorama)):
            arr(prim.center)
            arr(prim.radius)
        elif isinstance(prim, Plane):
            arr(prim.center)
            arr(prim.u_axis)
            arr(prim.v_axis)
            arr((prim.width, prim.height))
            arr(prim.uv_shift)
        elif isinstance(prim, (Cuboid, SkyBox)):
            arr(prim.basis)
            arr(prim.center)
            arr((prim.width, prim.height, prim.length))
            arr(prim.lb_local)
            arr(prim.rt_local)
        elif isinstance(prim, Disc):
            arr(prim.center)
            arr(prim.normal)
            arr(prim.u_axis)
            arr((prim.radius, prim.inner_radius))
        elif isinstance(prim, Cylinder):
            arr(prim.center)
            arr(prim.axis)
            arr(prim.u_axis)
            arr((prim.radius, prim.height, float(prim.capped)))
        elif isinstance(prim, TriangleMesh):
            arr(prim.vertices)
            up(np.ascontiguousarray(prim.faces).tobytes())
            up(bytes([prim.corner_normals is not None,
                      prim.corner_uvs is not None]))
            if prim.corner_normals is not None:
                arr(prim.corner_normals)
            if prim.corner_uvs is not None:
                arr(prim.corner_uvs)
        elif isinstance(prim, Triangle):
            arr(prim.p1)
            arr(prim.p2)
            arr(prim.p3)
        elif isinstance(prim, MeshInstances):
            mesh = prim.mesh
            arr(mesh.vertices)
            up(np.ascontiguousarray(mesh.faces).tobytes())
            up(bytes([mesh.corner_normals is not None,
                      mesh.corner_uvs is not None]))
            if mesh.corner_normals is not None:
                arr(mesh.corner_normals)
            if mesh.corner_uvs is not None:
                arr(mesh.corner_uvs)
            for (R, t, s, mat) in prim.instances:
                arr(R)
                arr(t)
                arr((s,))
                if mat is not None:
                    _fp_material(h, mat, up)
    for light in scene.Light_list:
        up(type(light).__name__.encode())
        arr(getattr(light, "Ldir", getattr(light, "pos", (0, 0, 0))))
        arr(light.color)
        if hasattr(light, "direction"):     # SpotLight cone parameters
            arr(light.direction)
            arr((light.cos_inner, light.cos_outer, 0.0))
    for p in scene.importance_sampled_list:
        arr(p.center)
        arr(p.bounded_sphere_radius)
    arr(scene.ambient_color)
    up(np.asarray(scene.n, np.complex128).tobytes())
    return h.digest()


def compile_scene_cached(scene) -> Tuple[SceneStatic, "SceneData"]:
    """compile_scene with a per-Scene content cache: repeated renders of an
    unmutated scene skip table construction AND the device upload (~155 ms
    per render at 20k triangles; every animation frame for static geometry).
    """
    # a cache HIT skips compile_scene, which is where the persistent-cache
    # backend re-point lives — run it here too so a scene compiled before a
    # late jax.config.update("jax_platforms", "cpu") still lands its jit
    # compiles in the fingerprint-keyed CPU directory (ADVICE r4)
    from .. import _ensure_cache_matches_backend
    _ensure_cache_matches_backend()
    fp = scene_fingerprint(scene)
    cache = getattr(scene, "_compile_cache", None)
    if cache is not None and cache[0] == fp:
        return cache[1], cache[2]
    static, data = compile_scene(scene)
    scene._compile_cache = (fp, static, data)
    return static, data


class _Builder:
    def __init__(self):
        self.spheres = []          # (center, radius)
        self.planes = []           # (center, u, v, w2, h2, shift)
        self.boxes = []            # (basis, center, whl, lb_local, rt_local)
        self.discs = []            # (center, normal, u, v, r_out, r_in)
        self.cyls = []             # (center, axis, u, v, radius, hh, capped)
        self.tris = []             # (p1, p2, p3)
        # (start_row, count, corner_normals|None, corner_uvs|None) runs of
        # mesh vertex attributes, parallel to self.tris
        self.tri_attr_blocks = []
        # (start_row, count, tri_ref_index) runs of normal-mapped mesh faces;
        # tri_ref_index numbers the 'tri'-kind entries of self.normal_maps
        self.tri_nm_blocks = []
        self._tri_nm_refs = 0
        # MeshInstances groups: (mesh, [instance dict], nm_ref or None).
        # Their triangles are NOT in self.tris — compile_scene lays each
        # group out as its own object-space region (see _layout_instanced).
        self.mesh_groups = []
        # per-type object property rows (merged in type order at the end)
        self.props = {k: [] for k in ("sphere", "plane", "box", "disc",
                                      "cyl", "tri")}
        self.textures = []
        self._tex_ids = {}
        self.mat_slots = {}        # id(material) -> (type, slot)
        self.mat_rows = {MAT_DIFFUSE: [], MAT_GLOSSY: [], MAT_REFRACTIVE: [],
                         MAT_THINFILM: [], MAT_EMISSIVE: [], MAT_ENV: [],
                         MAT_CUSTOM: []}
        self.diffuse_tex = []
        self.glossy_tex = []
        self.emissive_tex = []
        self.thinfilm_lut = []
        self.thinfilm_noise = []
        self.thinfilm_comp = []
        self.env_slots = []
        self.normal_maps = []      # (type_key, local_id, tex, repeat, kind)

    # -- textures ----------------------------------------------------------
    def add_texture(self, arr):
        # store the ORIGINAL array; normalization + device upload happen in
        # _texture_to_device so its per-array cache stays hot across compiles
        key = id(arr)
        if key not in self._tex_ids:
            self._tex_ids[key] = len(self.textures)
            self.textures.append(arr)
        return self._tex_ids[key]

    # -- materials ---------------------------------------------------------
    def material_slot(self, mat):
        key = id(mat)
        if key in self.mat_slots:
            return self.mat_slots[key]
        t = mat.mat_type
        slot = len(self.mat_rows[t])
        self.mat_rows[t].append(mat)
        self.mat_slots[key] = (t, slot)

        def tex_of(texture_obj, out_list):
            if isinstance(texture_obj, image_texture):
                out_list.append(TexRef(slot, self.add_texture(texture_obj.img),
                                       texture_obj.repeat,
                                       getattr(texture_obj, "bilinear", False)))

        if t == MAT_DIFFUSE:
            tex_of(mat.diff_texture, self.diffuse_tex)
        elif t == MAT_GLOSSY:
            tex_of(mat.diff_texture, self.glossy_tex)
        elif t == MAT_EMISSIVE:
            tex_of(mat.texture_color, self.emissive_tex)
        elif t == MAT_THINFILM:
            self.thinfilm_lut.append(TexRef(slot, self.add_texture(mat.lut), 1.0))
            self.thinfilm_noise.append(TexRef(slot, self.add_texture(mat.noise_texture), 1.0))
            comp = _tf_composed(mat)
            if comp is not None:
                # repeat carries the LUT row count so the replay can split
                # the composed index (see ops/pallas_record.py)
                self.thinfilm_comp.append(
                    TexRef(slot, self.add_texture(comp), float(comp.shape[0]
                           // (1 if mat.noise_factor == 0.0
                               else mat.noise_texture.shape[0]))))
        elif t == MAT_ENV:
            tex = mat.blur_texture if mat.blur_texture is not None else mat.texture
            lm = self.add_texture(mat.lightmap) if mat.lightmap is not None else None
            cm = (self.add_texture(_env_combined(mat, tex))
                  if mat.lightmap is not None else None)
            # kind is patched by the caller (depends on the carrier geometry)
            self.env_slots.append(EnvSlot(slot, "box", self.add_texture(tex),
                                          lm, cm))
        return (t, slot)

    # -- primitives --------------------------------------------------------
    def add_mesh_instances(self, prim: MeshInstances):
        """Register a MeshInstances group (object-space tables shared by all
        of its transforms; laid out as one region in _layout_instanced)."""
        if not prim.instances:
            raise ValueError("MeshInstances has no instances; call .add()")
        mesh = prim.mesh
        insts = []
        eff_mats = []
        for (R, tr, s, mat) in prim.instances:
            m = mat if mat is not None else prim.material
            eff_mats.append(m)
            mt, slot = self.material_slot(m)
            insts.append(dict(
                R=np.asarray(R, np.float64), t=np.asarray(tr, np.float64),
                s=float(s),
                row=dict(mat_type=mt, mat_slot=slot,
                         max_depth=min(prim.max_ray_depth, 10 ** 6),
                         mc=prim.mc, shadow=prim.shadow)))
        # normal maps: the per-face slot table is per PHYSICAL row, shared by
        # every instance — so all instances must agree on the map
        nm_ref = None
        nmaps = {id(m.normalmap) for m in eff_mats if m.normalmap is not None}
        if nmaps:
            if len(nmaps) > 1 or any(m.normalmap is None for m in eff_mats):
                raise ValueError(
                    "all instances of a MeshInstances group must share one "
                    "normal map (the tangent/slot tables are per mesh face)")
            if mesh.corner_uvs is None:
                raise ValueError(
                    "a normal-mapped MeshInstances mesh needs vt texture "
                    "coordinates in the OBJ (the tangent basis comes from "
                    "the uv layout)")
            m0 = eff_mats[0]
            nm_ref = self._tri_nm_refs
            self._tri_nm_refs += 1
            self.normal_maps.append(
                ("tri", nm_ref, self.add_texture(m0.normalmap),
                 m0.normalmap_repeat, "tri",
                 getattr(m0, "normalmap_bilinear", False)))
        self.mesh_groups.append((mesh, insts, nm_ref))

    def add_primitive(self, prim: Primitive):
        if isinstance(prim, MeshInstances):
            self.add_mesh_instances(prim)
            return
        t, slot = self.material_slot(prim.material)
        row = dict(mat_type=t, mat_slot=slot, max_depth=min(prim.max_ray_depth, 10 ** 6),
                   mc=prim.mc, shadow=prim.shadow)

        def register_normalmap(kind, type_key, local_id):
            m = prim.material
            if m.normalmap is not None:
                self.normal_maps.append(
                    (type_key, local_id, self.add_texture(m.normalmap),
                     m.normalmap_repeat, kind,
                     getattr(m, "normalmap_bilinear", False)))

        if isinstance(prim, (Sphere, Panorama)):
            local = len(self.spheres)
            self.spheres.append((prim.center, prim.radius))
            self.props["sphere"].append(row)
            if isinstance(prim, Panorama):
                self._patch_env_kind(slot, "sphere")
            else:
                register_normalmap("sphere", "sphere", local)
        elif isinstance(prim, Plane):
            local = len(self.planes)
            self.planes.append((prim.center, prim.u_axis, prim.v_axis,
                                prim.width / 2, prim.height / 2, prim.uv_shift))
            self.props["plane"].append(row)
            register_normalmap("plane", "plane", local)
        elif isinstance(prim, (Cuboid, SkyBox)):
            local = len(self.boxes)
            whl = (prim.width, prim.height, prim.length)
            self.boxes.append((prim.basis, prim.center, whl, prim.lb_local, prim.rt_local))
            self.props["box"].append(row)
            if isinstance(prim, SkyBox):
                self._patch_env_kind(slot, "box")
            else:
                register_normalmap("box", "box", local)
        elif isinstance(prim, Disc):
            if prim.material.normalmap is not None:
                raise ValueError("normal maps are not supported on Disc")
            self.discs.append((prim.center, prim.normal, prim.u_axis,
                               prim.v_axis, prim.radius, prim.inner_radius))
            self.props["disc"].append(row)
        elif isinstance(prim, Cylinder):
            if prim.material.normalmap is not None:
                raise ValueError("normal maps are not supported on Cylinder")
            self.cyls.append((prim.center, prim.axis, prim.u_axis,
                              prim.v_axis, prim.radius, prim.height / 2,
                              1.0 if prim.capped else 0.0))
            self.props["cyl"].append(row)
        elif isinstance(prim, TriangleMesh):
            start = len(self.tris)
            for tri in prim.triangles:
                self.tris.append((tri[0], tri[1], tri[2]))
                self.props["tri"].append(dict(row))
            if (prim.corner_normals is not None
                    or prim.corner_uvs is not None):
                self.tri_attr_blocks.append(
                    (start, len(prim.faces),
                     prim.corner_normals, prim.corner_uvs))
            if prim.material.normalmap is not None:
                if prim.corner_uvs is None:
                    raise ValueError(
                        "a normal-mapped TriangleMesh needs vt texture "
                        "coordinates in the OBJ (the tangent basis comes "
                        "from the uv layout)")
                ref = self._tri_nm_refs
                self._tri_nm_refs += 1
                self.normal_maps.append(
                    ("tri", ref, self.add_texture(prim.material.normalmap),
                     prim.material.normalmap_repeat, "tri",
                     getattr(prim.material, "normalmap_bilinear", False)))
                self.tri_nm_blocks.append((start, len(prim.faces), ref))
        elif isinstance(prim, Triangle):
            if prim.material.normalmap is not None:
                raise ValueError("normal maps require a (u,v,n) basis; "
                                 "supported on Plane, Cuboid and "
                                 "TriangleMesh (with vt) only")
            self.tris.append((prim.p1, prim.p2, prim.p3))
            self.props["tri"].append(row)
        else:
            raise TypeError(f"unsupported primitive {type(prim).__name__}")

    def _patch_env_kind(self, slot, kind):
        for i, e in enumerate(self.env_slots):
            if e.slot == slot:
                self.env_slots[i] = dataclasses.replace(e, kind=kind)


# Caps for the fully-unrolled Pallas kernels: every object is an unrolled
# intersect + normal select, and every shading GROUP (distinct material
# slot / depth-cap / mc combination) is an unrolled shading block.  Measured
# on TPU v5e (scripts/probe_obj_cap.py): 48 objects / 6 groups and 36
# objects / 36 groups both compile (577 s / 902 s through the remote-compile
# tunnel, persistently cached, then 2-3x faster than the jnp wavefront) but
# 46+ GROUPS kills the compiler subprocess outright — the group count, not
# the object count, is the hard wall.  Past either cap the scene renders
# through the jnp wavefront (96 solid objects measured 0.49 s there).
PALLAS_MAX_OBJECTS = 48
PALLAS_MAX_GROUPS = 36

# The per-ray-stack BVH traversal is RETIRED (round 3).  The reference has
# no acceleration structure at all (its mesh header begs for one,
# triangle_mesh.py:7-9); here the binned-SAH build survives only as the
# compile-time leaf ORDER feeding the clustered sweep.  Two independent
# reasons the on-device traversal is gone:
#   1. Measured on TPU v5e: the data-parallel sweeps beat the divergent
#      per-ray stack traversal by >10x at 5k triangles (the while-loop
#      serializes all rays to the worst traversal depth and scatters
#      stack entries).
#   2. It reliably CRASHED the TPU worker ("kernel fault") at >=327k tris
#      x 480k rays (bisection 2026-08-18, scripts/repro_200k_crash.py).
#      Root-caused 2026-08-19: the crash reproduces with NO raytracer code
#      — a jnp-only lax.while_loop carrying a (480k, 64) int32 per-ray
#      stack mutated by data-dependent .at[rows, sp].set scatters over a
#      163k-node synthetic tree kills the worker on rep 0
#      (scripts/repro_bvh_minimal.py) — an XLA:TPU / tpu-runtime fault in
#      the compiled while_loop+scatter pattern at scale, not a geometry
#      bug.  The clustered sweep at the SAME scale passes nearest AND
#      occlusion and is hardware-validated to 1.31M triangles (sublinear:
#      2.9 s @ 327k, 3.6 s @ 655k, 3.9 s @ 1.31M per 480k-ray sweep).

# Triangle count at which the compiler switches the jnp sweep to the
# two-level clustered form (geometry/intersect.py): triangles permuted into
# SAH leaf order, one inflated AABB per TRI_CLUSTER_SIZE run, ray-tile x
# cluster scan with lax.cond skipping pairs whose tile misses the AABB.
# Below this the flat blocked sweep wins (a single cluster can't skip).
# The clustered sweep is the production path for ALL large meshes
# (hardware-validated to 1.31M triangles; see the retirement note above).
TRI_CLUSTER_THRESHOLD = 1024


def _cluster_runs(TV, B):
    """Fixed contiguous B-runs of the leaf-ordered triangles: (starts,
    bbox_lo, bbox_hi).

    Negative result (interleaved A/B, spread scene, 46k tris): cutting the
    BVH into TREELETS of <= B instead — subtree-tight boxes, 2.5x less total
    AABB surface area — measured 25% SLOWER end-to-end (3.25 s vs 2.59 s):
    the ~1.5x extra clusters cost more cond overhead and redundant overlap
    retests than the tighter boxes save.  Fixed runs of the SAH leaf order
    are already spatially compact."""
    T = TV.shape[0]
    C = -(-T // B)
    v64 = np.pad(TV.astype(np.float64).reshape(-1, 3),
                 ((0, (C * B - T) * 3), (0, 0)),
                 constant_values=np.nan).reshape(C, B * 3, 3)
    starts = np.arange(C, dtype=np.int64) * B
    return starts, np.nanmin(v64, axis=1), np.nanmax(v64, axis=1)


def _inflate(lo, hi):
    """Conservative f32 inflation of cluster AABBs: the box is only a
    prefilter (the triangle test decides hits), so slab rounding must never
    cull a genuinely hit cluster."""
    pad = 1e-4 * (hi - lo + np.abs(lo) + np.abs(hi) + 1.0)
    return _f(lo - pad), _f(hi + pad)


def _inst_world_aabb(lo, hi, R, t, s):
    """(C, 3) object-space boxes -> world AABBs under world = R @ (s x) + t
    (transform all 8 corners; min/max)."""
    corners = np.stack([np.where(np.asarray(m, bool)[None, :], hi, lo)
                        for m in np.ndindex(2, 2, 2)], axis=1)    # (C, 8, 3)
    w = (s * corners) @ R.T + t[None, None, :]
    return w.min(axis=1), w.max(axis=1)


def _layout_instanced(b, TV, CVN, CUV, TNM):
    """Physical/virtual triangle-table layout for MeshInstances scenes.

    Regions: region 0 = plain triangles (Triangle prims + non-instanced
    meshes, identity transform), then one region per group holding ONE
    object-space copy of the mesh shared by all of its instances — the
    two-level "TLAS" the reference never had (its mesh support is dead code,
    triangle_mesh.py:12-43).  Every region is SAH-leaf-ordered and padded to
    a whole number of TRI_CLUSTER_SIZE rows with degenerate (zero) triangles
    so a cluster's fixed-size dynamic_slice can never pick up rows owned by a
    different instance transform.  Each (cluster, instance) pair contributes
    one cluster record whose AABB is the object-space box pushed through the
    instance transform; the sweep pulls ray tiles into instance space instead
    (geometry/intersect.py) — t-parameterization is preserved by rigid +
    uniform-scale maps, so nearest-hit compares stay in world units.

    Virtual object ids: region-0 rows first (one id per row), then one id per
    (instance, row).  tri_virt_row / tri_virt_inst map a virtual id back to
    its physical row and owning instance for hit attributes
    (geometry/attrs.py).
    """
    from ..geometry.intersect import TRI_CLUSTER_SIZE as B
    from ..native import build_bvh

    any_attrs = CVN is not None or any(
        mesh.corner_normals is not None or mesh.corner_uvs is not None
        for mesh, _, _ in b.mesh_groups)
    any_nm = TNM is not None or any(ref is not None
                                    for _, _, ref in b.mesh_groups)

    def _default_cvn(tvr):
        fn = np.cross(tvr[:, 1] - tvr[:, 0], tvr[:, 2] - tvr[:, 0])
        fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
        return np.repeat(fn[:, None, :], 3, axis=1).astype(np.float64)

    def _default_cuv(T):
        return np.tile(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
                       (T, 1, 1))

    phys_tv, phys_cvn, phys_cuv, phys_tnm = [], [], [], []
    cl_lo, cl_hi, cl_start, cl_virt, cl_inst = [], [], [], [], []
    inst_R, inst_t, inst_s = [np.eye(3)], [np.zeros(3)], [1.0]
    virt_rows, virt_insts = [], []
    seg_props = []           # (row count, shared props row) per instance
    state = {"phys": 0, "virt": 0}

    def add_region(tvr, cvnr, cuvr, tnmr, transforms):
        """transforms: list of (R, t, s, inst_id or None to allocate)."""
        T = tvr.shape[0]
        perm = (build_bvh(tvr)["order"] if T >= 2
                else np.arange(T, dtype=np.int64))
        tvr = tvr[perm]
        starts, lo, hi = _cluster_runs(tvr, B)
        C = starts.shape[0]
        padr = C * B - T
        phys_tv.append(np.pad(tvr, ((0, padr), (0, 0), (0, 0))))
        if any_attrs:
            # provided tables are pre-permutation; defaults come from the
            # already-permuted vertices and need no reorder
            cvnr = _default_cvn(tvr) if cvnr is None else cvnr[perm]
            cuvr = _default_cuv(T) if cuvr is None else cuvr[perm]
            phys_cvn.append(np.pad(cvnr, ((0, padr), (0, 0), (0, 0))))
            phys_cuv.append(np.pad(cuvr, ((0, padr), (0, 0), (0, 0))))
        if any_nm:
            tnmr = (np.full((T,), -1, I32) if tnmr is None
                    else np.asarray(tnmr)[perm])
            phys_tnm.append(np.pad(tnmr, (0, padr), constant_values=-1))
        for (R, tr, s, inst_id) in transforms:
            if inst_id is None:
                inst_id = len(inst_R)
                inst_R.append(R)
                inst_t.append(tr)
                inst_s.append(s)
            lo_w, hi_w = _inst_world_aabb(lo, hi, R, tr, s)
            lo_w, hi_w = _inflate(lo_w, hi_w)
            cl_lo.append(lo_w)
            cl_hi.append(hi_w)
            cl_start.append(state["phys"] + starts)
            cl_virt.append(state["virt"] + starts)
            cl_inst.append(np.full((C,), inst_id, I32))
            virt_rows.append(state["phys"] + np.arange(T, dtype=np.int64))
            virt_insts.append(np.full((T,), inst_id, I32))
            state["virt"] += T
        state["phys"] += C * B
        return perm

    perm0 = None
    if TV.shape[0]:
        # attr/nm permutation happens inside add_region; the caller permutes
        # the per-row property dicts with the returned perm
        perm0 = add_region(TV, CVN, CUV, TNM,
                           [(np.eye(3), np.zeros(3), 1.0, 0)])
    for mesh, insts, nm_ref in b.mesh_groups:
        tvr = np.asarray(mesh.triangles, F32)
        T = tvr.shape[0]
        cvnr = cuvr = None
        if any_attrs:
            cvnr = (np.asarray(mesh.corner_normals, np.float64)
                    if mesh.corner_normals is not None else None)
            cuvr = (np.asarray(mesh.corner_uvs, np.float64)
                    if mesh.corner_uvs is not None else None)
        tnmr = None
        if any_nm:
            tnmr = np.full((T,), -1 if nm_ref is None else nm_ref, I32)
        add_region(tvr, cvnr, cuvr, tnmr,
                   [(i["R"], i["t"], i["s"], None) for i in insts])
        for i in insts:
            seg_props.append((T, i["row"]))

    cat = np.concatenate
    return dict(
        TV=cat(phys_tv).astype(F32),
        CVN=cat(phys_cvn) if any_attrs else None,
        CUV=cat(phys_cuv) if any_attrs else None,
        TNM=cat(phys_tnm) if any_nm else None,
        cl_lo=cat(cl_lo), cl_hi=cat(cl_hi),
        cl_start=_i(cat(cl_start)), cl_virt=_i(cat(cl_virt)),
        cl_inst=cat(cl_inst),
        virt_row=_i(cat(virt_rows)), virt_inst=cat(virt_insts),
        inst_rot=_f(np.stack(inst_R)), inst_trans=_f(np.stack(inst_t)),
        inst_inv_scale=_f(1.0 / np.asarray(inst_s)),
        seg_props=seg_props, n_virtual=state["virt"], perm0=perm0,
    )


def compile_scene(scene) -> Tuple[SceneStatic, SceneData]:
    # late platform pins (jax.config.update("jax_platforms", "cpu") after
    # the package import) must re-point the persistent XLA cache before the
    # first program of this scene is built (see __init__._set_cache_dir)
    from .. import _ensure_cache_matches_backend
    _ensure_cache_matches_backend()

    b = _Builder()
    for prim in scene.scene_primitives:
        b.add_primitive(prim)

    # Triangle vertices as ONE (T, 3, 3) array: every derived table below is
    # a vectorized numpy expression over it.  (Per-triangle Python loops here
    # cost ~0.5 ms/tri — 10 s of HOST time per render call at 20k faces,
    # dwarfing the device sweep they feed.)
    TV = (np.asarray(b.tris, dtype=F32) if b.tris
          else np.zeros((0, 3, 3), F32))

    # ---- per-corner vertex attributes (smooth normals / mesh uvs) --------
    # Built parallel to TV BEFORE any leaf-order permutation; defaults make
    # interpolation exact for plain triangles (face normal at every corner,
    # barycentric-identity uvs).
    CVN = CUV = None
    if b.tri_attr_blocks and TV.shape[0]:
        _fn0 = np.cross(TV[:, 1] - TV[:, 0], TV[:, 2] - TV[:, 0])
        _fn0 = _fn0 / np.maximum(
            np.linalg.norm(_fn0, axis=-1, keepdims=True), 1e-20)
        CVN = np.repeat(_fn0[:, None, :], 3, axis=1).astype(np.float64)
        CUV = np.tile(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
                      (TV.shape[0], 1, 1))
        for a_start, a_count, a_vn, a_uv in b.tri_attr_blocks:
            if a_vn is not None:
                CVN[a_start:a_start + a_count] = a_vn
            if a_uv is not None:
                CUV[a_start:a_start + a_count] = a_uv

    # normal-mapped mesh faces: per-face 'tri'-ref slot, -1 elsewhere
    TNM = None
    if b.tri_nm_blocks and TV.shape[0]:
        TNM = np.full((TV.shape[0],), -1, I32)
        for a_start, a_count, a_ref in b.tri_nm_blocks:
            TNM[a_start:a_start + a_count] = a_ref

    # ---- triangle leaf order (native binned-SAH build) + cluster AABBs ----
    perm = None
    tri_cl_lo = np.zeros((0, 3), F32)
    tri_cl_hi = np.zeros((0, 3), F32)
    tri_cl_start = np.zeros((0,), I32)
    lay = None
    if b.mesh_groups:
        # instanced scenes ALWAYS use the clustered sweep (the flat sweep has
        # no per-row transform); _layout_instanced permutes/pads the attr
        # tables itself, region 0's per-row property dicts are permuted here
        lay = _layout_instanced(b, TV, CVN, CUV, TNM)
        if lay["perm0"] is not None:
            b.props["tri"] = [b.props["tri"][i] for i in lay["perm0"]]
        TV, CVN, CUV, TNM = lay["TV"], lay["CVN"], lay["CUV"], lay["TNM"]
        tri_cl_lo, tri_cl_hi = lay["cl_lo"], lay["cl_hi"]
        tri_cl_start = lay["cl_start"]
    elif len(b.tris) >= TRI_CLUSTER_THRESHOLD:
        from ..geometry.intersect import TRI_CLUSTER_SIZE
        from ..native import build_bvh
        perm = build_bvh(TV)["order"]
        TV = TV[perm]
        b.props["tri"] = [b.props["tri"][i] for i in perm]
        starts, lo, hi = _cluster_runs(TV, TRI_CLUSTER_SIZE)
        tri_cl_lo, tri_cl_hi = _inflate(lo, hi)
        tri_cl_start = _i(starts)

    if perm is not None and CVN is not None:
        CVN = CVN[perm]
        CUV = CUV[perm]
    if perm is not None and TNM is not None:
        TNM = TNM[perm]

    # ---- triangle derived tables (vectorized over TV) --------------------
    P1, P2, P3 = TV[:, 0], TV[:, 1], TV[:, 2]

    # uv-aligned tangents for normal-mapped meshes: T = dP/du from the
    # corner-uv derivative; orthonormalized against the shading normal at
    # the hit (integrator._apply_normal_maps).  sign(det) records the uv
    # handedness so mirrored islands keep a right-handed (T, B, N) frame.
    TTAN = TSGN = None
    if TNM is not None:
        e1 = (P2 - P1).astype(np.float64)
        e2 = (P3 - P1).astype(np.float64)
        duv1 = CUV[:, 1] - CUV[:, 0]
        duv2 = CUV[:, 2] - CUV[:, 0]
        det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
        inv = 1.0 / np.where(np.abs(det) < 1e-12,
                             np.where(det < 0, -1e-12, 1e-12), det)
        tan = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * inv[:, None]
        nrm = np.linalg.norm(tan, axis=1, keepdims=True)
        # degenerate uv layout: any face-perpendicular fallback works
        tan = np.where(nrm > 1e-12, tan / np.maximum(nrm, 1e-12),
                       (P2 - P1) / np.maximum(
                           np.linalg.norm(P2 - P1, axis=1, keepdims=True),
                           1e-12))
        TTAN = tan
        TSGN = np.where(det < 0, -1.0, 1.0)
    _nr = np.cross(P2 - P1, P3 - P1)
    _nr_u = _nr / np.maximum(np.linalg.norm(_nr, axis=-1, keepdims=True), 1e-20)
    tri_normal = _f(_nr_u)
    tri_n31 = _f(np.cross(P3 - P1, _nr_u))
    tri_n12 = _f(np.cross(P1 - P2, _nr_u))
    tri_n23 = _f(np.cross(P2 - P3, _nr_u))

    # ---- geometry tables -------------------------------------------------
    geom = GeometryTables(
        sphere_center=_stack3([np.asarray(c) for c, _ in b.spheres]),
        sphere_radius=_arr1([r for _, r in b.spheres]),
        plane_center=_stack3([np.asarray(c) for c, *_ in b.planes]),
        plane_normal=_stack3([
            (lambda n: n / np.linalg.norm(n))(np.cross(u, v))
            for _, u, v, *_ in b.planes]),
        plane_u_axis=_stack3([u for _, u, *_ in b.planes]),
        plane_v_axis=_stack3([v for _, _, v, *_ in b.planes]),
        plane_half_w=_arr1([w for *_, w, _, _ in b.planes]),
        plane_half_h=_arr1([h for *_, h, _ in b.planes]),
        plane_uv_shift=(_f(np.stack([s for *_, s in b.planes]))
                        if b.planes else np.zeros((0, 2), F32)),
        box_basis=(_f(np.stack([m for m, *_ in b.boxes]))
                   if b.boxes else np.zeros((0, 3, 3), F32)),
        box_center=_stack3([c for _, c, *_ in b.boxes]),
        box_whl=_stack3([np.asarray(w) for *_, w, _, _ in b.boxes]),
        box_lb_local=_stack3([lb for *_, lb, _ in b.boxes]),
        box_rt_local=_stack3([rt for *_, rt in b.boxes]),
        disc_center=_stack3([c for c, *_ in b.discs]),
        disc_normal=_stack3([n for _, n, *_ in b.discs]),
        disc_u_axis=_stack3([u for _, _, u, *_ in b.discs]),
        disc_v_axis=_stack3([v for _, _, _, v, *_ in b.discs]),
        disc_r_out=_arr1([r for *_, r, _ in b.discs]),
        disc_r_in=_arr1([ri for *_, ri in b.discs]),
        cyl_center=_stack3([c for c, *_ in b.cyls]),
        cyl_axis=_stack3([a for _, a, *_ in b.cyls]),
        cyl_u_axis=_stack3([u for _, _, u, *_ in b.cyls]),
        cyl_v_axis=_stack3([v for _, _, _, v, *_ in b.cyls]),
        cyl_radius=_arr1([r for *_, r, _, _ in b.cyls]),
        cyl_half_h=_arr1([hh for *_, hh, _ in b.cyls]),
        cyl_capped=_arr1([cp for *_, cp in b.cyls]),
        tri_p1=_f(P1),
        tri_p2=_f(P2),
        tri_p3=_f(P3),
        tri_normal=tri_normal,
        tri_centroid=_f((P1 + P2 + P3) / 3.0),
        tri_n31=tri_n31,
        tri_n12=tri_n12,
        tri_n23=tri_n23,
        tri_cl_lo=tri_cl_lo,
        tri_cl_hi=tri_cl_hi,
        tri_cl_start=tri_cl_start,
        tri_vn1=_f(CVN[:, 0]) if CVN is not None else np.zeros((0, 3), F32),
        tri_vn2=_f(CVN[:, 1]) if CVN is not None else np.zeros((0, 3), F32),
        tri_vn3=_f(CVN[:, 2]) if CVN is not None else np.zeros((0, 3), F32),
        tri_uv1=_f(CUV[:, 0]) if CUV is not None else np.zeros((0, 2), F32),
        tri_uv2=_f(CUV[:, 1]) if CUV is not None else np.zeros((0, 2), F32),
        tri_uv3=_f(CUV[:, 2]) if CUV is not None else np.zeros((0, 2), F32),
        tri_tan=_f(TTAN) if TTAN is not None else np.zeros((0, 3), F32),
        tri_tan_sign=_f(TSGN) if TSGN is not None else np.zeros((0,), F32),
        tri_nm_slot=(TNM if TNM is not None else np.zeros((0,), I32)),
        tri_cl_inst=(lay["cl_inst"] if lay else np.zeros((0,), I32)),
        tri_cl_virt=(lay["cl_virt"] if lay else tri_cl_start),
        tri_virt_row=(lay["virt_row"] if lay else np.zeros((0,), I32)),
        tri_virt_inst=(lay["virt_inst"] if lay else np.zeros((0,), I32)),
        inst_rot=(lay["inst_rot"] if lay else np.zeros((0, 3, 3), F32)),
        inst_trans=(lay["inst_trans"] if lay else np.zeros((0, 3), F32)),
        inst_inv_scale=(lay["inst_inv_scale"] if lay
                        else np.zeros((0,), F32)),
    )

    # ---- object tables in global (virtual) id order ------------------------
    # dict rows cover spheres/planes/boxes/plain triangles; MeshInstances
    # groups append one CONSTANT segment per instance (np.full, not per-face
    # Python dicts — host compile time stays O(mesh), not O(instances*mesh))
    rows = (b.props["sphere"] + b.props["plane"] + b.props["box"]
            + b.props["disc"] + b.props["cyl"] + b.props["tri"])
    segs = lay["seg_props"] if lay else []

    def _col(key, dtype):
        parts = []
        if rows:
            parts.append(np.asarray([r[key] for r in rows], dtype))
        for cnt, r in segs:
            parts.append(np.full((cnt,), r[key], dtype))
        return np.concatenate(parts) if parts else np.zeros((0,), dtype)

    mat_type_a = _col("mat_type", I32)
    mat_slot_a = _col("mat_slot", I32)
    depth_raw = _col("max_depth", I32)
    depth_a = np.minimum(depth_raw, 1023)
    mc_a = _col("mc", bool)
    shadow_a = _col("shadow", bool)
    packed_a = (mat_type_a
                | (mat_slot_a << PACKED_SLOT_SHIFT)
                | (depth_a << PACKED_DEPTH_SHIFT)
                | (mc_a.astype(I32) << PACKED_MC_SHIFT)
                | (shadow_a.astype(I32) << PACKED_SHADOW_SHIFT))
    n_obj_total = int(mat_type_a.shape[0])
    obj = ObjectTables(mat_type=mat_type_a, mat_slot=mat_slot_a,
                       max_depth=depth_a, mc=mc_a, shadow=shadow_a,
                       packed=_i(packed_a))

    # ---- material tables -------------------------------------------------
    def solid_of(m, attr):
        t = getattr(m, attr)
        return t.color if isinstance(t, solid_color) else np.zeros(3)

    dif = b.mat_rows[MAT_DIFFUSE]
    glo = b.mat_rows[MAT_GLOSSY]
    ref = b.mat_rows[MAT_REFRACTIVE]
    tfi = b.mat_rows[MAT_THINFILM]
    emi = b.mat_rows[MAT_EMISSIVE]
    env = b.mat_rows[MAT_ENV]
    mats = MaterialTables(
        diffuse_color=_stack3([solid_of(m, "diff_texture") for m in dif]),
        diffuse_ambient_weight=_arr1([m.ambient_weight for m in dif]),
        glossy_color=_stack3([solid_of(m, "diff_texture") for m in glo]),
        glossy_n_re=_stack3([np.real(m.n) for m in glo]),
        glossy_n_im=_stack3([np.imag(m.n) for m in glo]),
        glossy_roughness=_arr1([m.roughness for m in glo]),
        glossy_spec=_arr1([m.spec_coeff for m in glo]),
        glossy_diff=_arr1([m.diff_coeff for m in glo]),
        refr_n_re=_stack3([np.real(m.n) for m in ref]),
        refr_n_im=_stack3([np.imag(m.n) for m in ref]),
        refr_dispersive=_arr1([float(getattr(m, "dispersion", False))
                               for m in ref]),
        tf_thickness=_arr1([m.thickness for m in tfi]),
        tf_noise=_arr1([m.noise_factor for m in tfi]),
        emissive_color=_stack3([solid_of(m, "texture_color") for m in emi]),
        env_light_intensity=_arr1([m.light_intensity for m in env]),
    )

    # duck-typed like 0.4.0 (user code may append light-like objects with
    # .Ldir/.pos directly); SpotLight also has .pos, so exclude it explicitly
    slts = [l for l in scene.Light_list if isinstance(l, SpotLight)]
    dlts = [l for l in scene.Light_list if hasattr(l, "Ldir")]
    plts = [l for l in scene.Light_list
            if hasattr(l, "pos") and not isinstance(l, SpotLight)]
    lights = LightTables(
        dir_l=_stack3([l.Ldir for l in dlts]),
        dir_color=_stack3([l.color for l in dlts]),
        point_pos=_stack3([l.pos for l in plts]),
        point_color=_stack3([l.color for l in plts]),
        spot_pos=_stack3([l.pos for l in slts]),
        spot_dir=_stack3([l.direction for l in slts]),
        spot_color=_stack3([l.color for l in slts]),
        spot_cos_in=_arr1([l.cos_inner for l in slts]),
        spot_cos_out=_arr1([l.cos_outer for l in slts]),
    )

    is_center = _stack3([p.center for p in scene.importance_sampled_list])
    is_radius = _arr1([p.bounded_sphere_radius for p in scene.importance_sampled_list])

    # normal maps -> static refs with global ids
    S, Pn, B = len(b.spheres), len(b.planes), len(b.boxes)
    offsets = {"sphere": 0, "plane": S, "box": S + Pn, "tri": S + Pn + B}
    nmaps = tuple(
        NormalMapRef(obj=(-1 if kind == "tri" else offsets[type_key] + local),
                     tex=tex, repeat=rep, basis_kind=kind, local_id=local,
                     bilinear=bl)
        for (type_key, local, tex, rep, kind, bl) in b.normal_maps
    )

    present = tuple(sorted(int(x) for x in np.unique(mat_type_a)))
    # uv coordinates are only needed when something samples them; solid-color
    # scenes (e.g. the Cornell box) skip the whole uv computation per bounce
    needs_uv = bool(b.diffuse_tex or b.glossy_tex or b.emissive_tex
                    or b.env_slots or b.thinfilm_lut or nmaps
                    or b.mat_rows[MAT_CUSTOM])  # custom shaders may read uv

    # ---- static per-object records + packed geometry for the Pallas path ---
    obj_records = []
    pallas_rows = []

    def _row(vals):
        r = np.zeros(24, dtype=F32)
        r[:len(vals)] = vals
        pallas_rows.append(r)

    for (c, r), props in zip(b.spheres, b.props["sphere"]):
        obj_records.append(ObjRecord("sphere", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"]))
        _row(list(np.asarray(c)) + [r])
    def _unit_axis(vec):
        """(axis, sign) when vec is an EXACT ±unit axis in f32, else None."""
        a = np.asarray(vec, F32)
        nz = np.nonzero(a)[0]
        if len(nz) == 1 and abs(a[nz[0]]) == 1.0:
            return int(nz[0]), float(np.sign(a[nz[0]]))
        return None

    for (c, u, v, w2, h2, _s), props in zip(b.planes, b.props["plane"]):
        nrm = np.cross(u, v)
        nrm = nrm / np.linalg.norm(nrm)
        axes = (_unit_axis(nrm), _unit_axis(u), _unit_axis(v))
        obj_records.append(ObjRecord("plane", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"],
                                     aa=(tuple(axes) if all(a is not None
                                                            for a in axes)
                                         else None)))
        _row(list(np.asarray(c)) + list(np.asarray(u)) + list(np.asarray(v))
             + list(nrm) + [w2, h2, _s[0], _s[1]])
    for (basis, c, whl, lbl, rtl), props in zip(b.boxes, b.props["box"]):
        obj_records.append(ObjRecord("box", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"]))
        _row(list(np.asarray(basis).reshape(-1)) + list(np.asarray(lbl))
             + list(np.asarray(rtl)) + list(np.asarray(c)) + list(np.asarray(whl)))
    for (c, n, u, v, ro, ri), props in zip(b.discs, b.props["disc"]):
        obj_records.append(ObjRecord("disc", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"]))
        _row(list(np.asarray(c)) + list(np.asarray(n)) + list(np.asarray(u))
             + list(np.asarray(v)) + [ro, ri])
    for (c, a, u, v, r, hh, cp), props in zip(b.cyls, b.props["cyl"]):
        obj_records.append(ObjRecord("cyl", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"]))
        _row(list(np.asarray(c)) + list(np.asarray(a)) + list(np.asarray(u))
             + list(np.asarray(v)) + [r, hh, float(cp)])
    for props in b.props["tri"]:
        obj_records.append(ObjRecord("tri", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"]))
    # one record per MeshInstances instance (not per face): records feed the
    # bounce-budget/split derivations and the Pallas group count; the Pallas
    # paths themselves are gated off for instanced scenes
    for _cnt, props in segs:
        obj_records.append(ObjRecord("tri", props["mat_type"], props["mat_slot"],
                                     min(props["max_depth"], 1023), props["mc"], props["shadow"]))
    tri_rows = np.zeros((TV.shape[0], 24), F32)
    tri_rows[:, 0:3] = P1
    tri_rows[:, 3:6] = P2
    tri_rows[:, 6:9] = P3
    tri_rows[:, 9:12] = _nr_u
    tri_rows[:, 12:15] = tri_n31
    tri_rows[:, 15:18] = tri_n12
    tri_rows[:, 18:21] = tri_n23
    pallas_geom = np.concatenate(
        [np.stack(pallas_rows) if pallas_rows else np.zeros((0, 24), F32),
         tri_rows]).astype(F32)

    # ---- environment importance sampling (alias tables) --------------------
    env_is_tabs = None
    env_is_shape = (0, 0)
    _is_envs = [(e, b.mat_rows[MAT_ENV][e.slot]) for e in b.env_slots
                if getattr(b.mat_rows[MAT_ENV][e.slot],
                           "importance_sampled", False)]
    if _is_envs:
        if len(_is_envs) > 1:
            raise ValueError(
                "only one environment may be importance_sampled")
        e, m = _is_envs[0]
        if e.kind != "sphere":
            raise ValueError(
                "environment importance sampling needs an equirect map — "
                "use Panorama / add_Background(spherical=True)")
        # sample the SAME array the env slot displays (blur variant if any)
        src = m.blur_texture if m.blur_texture is not None else m.texture
        if float(np.asarray(src, np.float64)[..., :3].sum()) <= 0.0:
            # a black map has no distribution to sample; building tables
            # anyway would draw uniform directions with a claimed pdf of 0
            # (a biased mixture) — fall back to the plain cosine/caps path
            env_is_shape = (0, 0)
        else:
            prob, alias_t, pdf_t, env_is_shape = _env_is_tables(src)
            env_is_tabs = (prob, alias_t, pdf_t)

    _PALLAS_TYPES = {MAT_EMISSIVE, MAT_GLOSSY, MAT_DIFFUSE, MAT_REFRACTIVE}
    _PALLAS_TEX_TYPES = _PALLAS_TYPES | {MAT_THINFILM, MAT_ENV}
    # The group cap is a COMPILER wall, not a semantics limit: each group is
    # one unrolled shading block, and ~46+ blocks kill the TPU compiler
    # subprocess (scripts/probe_obj_cap.py, r2).  Two group counts because
    # the two kernels compile different block sets:
    #  - the RECORD kernel keeps one block per (kind, slot, depth, mc) —
    #    its gid stream routes the replay's fetches (STATUS R4.11);
    #  - the SOLID kernel merges same-KIND groups into one block with
    #    per-lane parameter selection (R4.11), so a 48-object scene with 40
    #    distinct solid materials of 4 kinds compiles ~4 blocks.  Counting
    #    the merged key here (same keying as _make_kernel) is what lets
    #    many-material solid scenes ride the kernel (R5; hardware
    #    compile-time probe scripts/probe_group_gate.py).  NOTE: the
    #    probe-only merge_groups=False kernel variant compiles PER-SLOT
    #    blocks — A/B probes on scenes past the per-slot cap must not
    #    force it.
    n_groups_slot = len({(r.mat_type, r.mat_slot, r.max_depth, r.mc)
                         for r in obj_records})
    n_groups_merged = len(
        {(r.mat_type, r.max_depth, r.mc,
          bool(getattr(ref[r.mat_slot], "dispersion", False))
          if r.mat_type == MAT_REFRACTIVE else None)
         for r in obj_records})
    has_dispersion = any(getattr(m, "dispersion", False) for m in ref)
    _common_ok = (0 < n_obj_total <= PALLAS_MAX_OBJECTS
                  and len(scene.importance_sampled_list) <= 8
                  and not b.mesh_groups  # instanced scenes: jnp wavefront
                  and CVN is None)   # vertex-attr meshes shade on the
                                     # jnp wavefront (interp in attrs.py)
    pallas_ok = (_common_ok and n_groups_merged <= PALLAS_MAX_GROUPS
                 and not needs_uv and set(present) <= _PALLAS_TYPES)
    # path-recording variant: image textures / env maps / thin-film LUTs are
    # applied in a jnp pass over the recorded path vertices; normal maps
    # perturb sampling directions and cannot be deferred.  HDR envs ride the
    # RGB9E5 atlas encoding; bilinear textures fetch their 2x2 taps as ONE
    # quad-atlas gather row (R5; 4 separate taps pre-quad)
    # (ops/pallas_record.py) — neither forces the wavefront anymore (r3).
    pallas_tex_ok = (_common_ok and n_groups_slot <= PALLAS_MAX_GROUPS
                     and not pallas_ok and not nmaps
                     and not _is_envs    # env-IS mixture: jnp wavefront only
                     and set(present) <= _PALLAS_TEX_TYPES)

    (atlas, tex_scale, tex_shapes, tex_offsets,
     tex_enc) = _texture_atlas(tuple(b.textures))
    # quad atlas only when a replay-eligible bilinear texture exists (the
    # 4x memory + device build buy nothing otherwise)
    _any_bil = any(r.bilinear for r in (tuple(b.diffuse_tex)
                                        + tuple(b.glossy_tex)
                                        + tuple(b.emissive_tex)))
    atlas_quad = (_texture_atlas_quad(tuple(b.textures))
                  if _any_bil else None)

    # triangle object-id space is VIRTUAL under instancing: region-0 rows
    # then one id per (instance, row) — see _layout_instanced
    n_tris_virtual = lay["n_virtual"] if lay else len(b.tris)
    _d_raw = depth_raw[depth_raw < 999]
    static = SceneStatic(
        n_spheres=S, n_planes=Pn, n_boxes=B, n_tris=n_tris_virtual,
        n_objects=n_obj_total,
        n_discs=len(b.discs), n_cylinders=len(b.cyls),
        n_dir_lights=int(lights.dir_l.shape[0]),
        n_point_lights=int(lights.point_pos.shape[0]),
        n_spot_lights=len(slts),
        n_is_targets=int(is_center.shape[0]),
        mat_types_present=present,
        diffuse_tex=tuple(b.diffuse_tex),
        glossy_tex=tuple(b.glossy_tex),
        emissive_tex=tuple(b.emissive_tex),
        thinfilm_lut=tuple(b.thinfilm_lut),
        thinfilm_noise=tuple(b.thinfilm_noise),
        thinfilm_comp=tuple(b.thinfilm_comp),
        env_slots=tuple(b.env_slots),
        normal_maps=nmaps,
        tex_shapes=tex_shapes,
        tex_enc=tex_enc,
        tex_offsets=tex_offsets,
        has_shadow_objects=bool(shadow_a.any()),
        max_object_depth=int(_d_raw.max()) if _d_raw.size else 5,
        needs_uv=needs_uv,
        obj_records=tuple(obj_records),
        pallas_ok=pallas_ok,
        pallas_tex_ok=pallas_tex_ok,
        custom_mats=tuple(b.mat_rows[MAT_CUSTOM]),
        custom_fp=tuple(_custom_param_fp(m) for m in b.mat_rows[MAT_CUSTOM]),
        has_dispersion=has_dispersion,
        refr_disp=tuple(bool(getattr(m, "dispersion", False)) for m in ref),
        tri_interp=CVN is not None,
        env_is_shape=env_is_shape,
        tf_selp=tuple(_tf_sel_poly(m) for m in tfi),
    )

    data = SceneData(
        geom=geom, obj=obj, mats=mats, lights=lights,
        is_center=is_center, is_radius=is_radius,
        textures=tuple(_texture_to_device(t) for t in b.textures),
        ambient_color=_f(scene.ambient_color),
        scene_n_re=_f(np.real(scene.n)),
        scene_n_im=_f(np.imag(scene.n)),
        pallas_geom=pallas_geom,
        tex_atlas=atlas,
        tex_atlas_quad=atlas_quad,
        tex_scale=tex_scale,
        env_is_prob=(env_is_tabs[0] if env_is_tabs
                     else np.zeros((0,), F32)),
        env_is_alias=(env_is_tabs[1] if env_is_tabs
                      else np.zeros((0,), I32)),
        env_is_pdf=(env_is_tabs[2] if env_is_tabs
                    else np.zeros((0,), F32)),
    )
    return static, _to_device(data)
