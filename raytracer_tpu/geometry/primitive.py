"""Host-side scene-description primitives.

These mirror the reference's user API (sightpy/geometry/*.py) but are pure
descriptions: no intersection logic lives here.  `Scene.render` lowers the
primitive list into flat struct-of-arrays tables (core/compile.py) consumed
by the jit-compiled wavefront integrator.

Rotation uses the same axis-angle Rodrigues matrix as the reference
(primitive.py:17-44) applied eagerly to the stored host-side parameters.
"""

from __future__ import annotations

import numpy as np

from ..core.vec import as_float3, vec3


def rotation_matrix(theta_deg, axis):
    """Axis-angle rotation matrix, matching reference primitive.py:17-42."""
    u = as_float3(axis, "axis")
    u = u / np.linalg.norm(u)
    th = np.deg2rad(theta_deg)
    c = np.cos(th)
    s = np.sqrt(1 - c ** 2) * np.sign(th)
    x, y, z = u
    return np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])


class Primitive:
    """Base scene object: geometry description + material + per-object limits.

    Matches the reference Primitive (geometry/primitive.py:6-44): every object
    carries its own recursion cap `max_ray_depth`, a `shadow` flag (does it
    occlude shadow rays?) and an `mc` flag (stochastic single-branch
    refraction instead of deterministic splitting).
    """

    def __init__(self, center, material, max_ray_depth=5, shadow=True, mc=False):
        self.center = as_float3(center, "center")
        self.material = material
        if material is not None:
            material.assigned_primitive = self
        self.max_ray_depth = int(max_ray_depth)
        self.shadow = bool(shadow)
        self.mc = bool(mc)
        # radius of a bounding sphere, used by importance sampling
        # (reference sphere.py:16, plane.py:32, cuboid.py:15-17)
        self.bounded_sphere_radius = 0.0

    def rotate(self, θ=None, u=None, theta=None, axis=None):
        """Rotate the primitive about its center (axis-angle, degrees)."""
        theta = θ if θ is not None else theta
        axis = u if u is not None else axis
        M = rotation_matrix(theta, axis)
        self._apply_rotation(M)
        # record for scene export (scene_io): replaying the list through
        # rotate() reconstructs the mutated state with identical float ops
        self._rotations = getattr(self, "_rotations", []) + [
            (float(theta), [float(c) for c in as_float3(axis, "axis")])]
        return self

    def _apply_rotation(self, M):
        raise NotImplementedError(
            f"{type(self).__name__} does not support rotation")

    @property
    def center_vec3(self):
        return vec3(*self.center)


class Sphere(Primitive):
    """Reference sphere.py:7-18."""

    def __init__(self, center, material, radius, max_ray_depth=5, shadow=True, mc=False):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        self.radius = float(radius)
        self.bounded_sphere_radius = self.radius

    def _apply_rotation(self, M):
        pass  # a sphere is rotation-invariant about its own center


class Plane(Primitive):
    """Finite rectangle (reference plane.py:7-35)."""

    def __init__(self, center, material, width, height, u_axis, v_axis,
                 max_ray_depth=5, shadow=True, uv_shift=(0.0, 0.0), mc=False):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        self.width = float(width)
        self.height = float(height)
        self.u_axis = as_float3(u_axis, "u_axis")
        self.v_axis = as_float3(v_axis, "v_axis")
        self.uv_shift = (float(uv_shift[0]), float(uv_shift[1]))
        self.bounded_sphere_radius = np.sqrt((width / 2) ** 2 + (height / 2) ** 2)

    @property
    def normal(self):
        n = np.cross(self.u_axis, self.v_axis)
        return n / np.linalg.norm(n)

    def _apply_rotation(self, M):
        self.u_axis = M @ self.u_axis
        self.v_axis = M @ self.v_axis


class Cuboid(Primitive):
    """Oriented box (reference cuboid.py:7-32).  Rotatable local basis."""

    def __init__(self, center, material, width, height, length,
                 max_ray_depth=5, shadow=True, mc=False):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        self.width = float(width)
        self.height = float(height)
        self.length = float(length)
        self.bounded_sphere_radius = np.sqrt(
            (width / 2) ** 2 + (height / 2) ** 2 + (length / 2) ** 2)
        half = np.array([width / 2, height / 2, length / 2])
        self.lb = self.center - half
        self.rt = self.center + half
        # rows of `basis` are the box axes (world -> local transform)
        self.basis = np.eye(3)

    def _apply_rotation(self, M):
        self.basis = self.basis @ M.T     # rotate each axis row: ax' = M @ ax
        self.lb = self.center + M @ (self.lb - self.center)
        self.rt = self.center + M @ (self.rt - self.center)

    @property
    def lb_local(self):
        return self.basis @ self.lb

    @property
    def rt_local(self):
        return self.basis @ self.rt


def stable_unit(v):
    """Normalize to a FIXED POINT of normalization: stable_unit(
    stable_unit(v)) is bitwise-identical to stable_unit(v).  Plain
    v / ||v|| is not idempotent in floating point (||unit|| can land 1 ulp
    off 1.0), which would break the scene exporter's exact round trip
    (scene_io: constructors re-normalize reloaded vectors)."""
    v = np.asarray(v, np.float64)
    for _ in range(4):
        n = np.linalg.norm(v)
        if n == 1.0:
            return v
        v = v / n
    return v


def _orthonormal_frame(normal, u_hint=None):
    """(u, v) orthonormal in the plane perpendicular to `normal`.

    With `u_hint`, u is the hint projected into the plane (texture/uv
    orientation control); otherwise a stable default axis is picked.
    """
    n = stable_unit(normal)
    if u_hint is not None:
        u = np.asarray(as_float3(u_hint, "u_axis"), np.float64)
        if np.linalg.norm(u - n * np.dot(u, n)) < 1e-9:
            raise ValueError("u_axis is parallel to the normal")
        # iterate project+normalize to a fixed point, so a reloaded
        # (already-perpendicular) u_axis reconstructs bitwise (scene_io)
        for _ in range(4):
            u2 = stable_unit(u - n * np.dot(u, n))
            if np.array_equal(u2, u):
                break
            u = u2
    else:
        ref = np.array([0.0, 1.0, 0.0]) if abs(n[1]) < 0.9 \
            else np.array([1.0, 0.0, 0.0])
        u = stable_unit(np.cross(ref, n))
    v = np.cross(n, u)
    return u, v


class Disc(Primitive):
    """Flat circular disc / annulus — beyond the reference (sightpy's only
    planar finite primitive is the rectangle, plane.py:7-35).

    `normal` faces the front side; `inner_radius > 0` cuts a concentric
    hole (an annulus).  uv is planar over the disc's bounding square
    (u, v ∈ [0, 1] at the rim), oriented by `u_axis` when given.
    """

    def __init__(self, center, material, radius, normal=(0.0, 1.0, 0.0),
                 inner_radius=0.0, u_axis=None, max_ray_depth=5,
                 shadow=True, mc=False):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        self.radius = float(radius)
        self.inner_radius = float(inner_radius)
        if not 0.0 <= self.inner_radius < self.radius:
            raise ValueError(
                f"inner_radius must be in [0, radius), got "
                f"{self.inner_radius} vs radius {self.radius}")
        self.normal = stable_unit(as_float3(normal, "normal"))
        self.u_axis, self.v_axis = _orthonormal_frame(self.normal, u_axis)
        self.bounded_sphere_radius = self.radius

    def _apply_rotation(self, M):
        self.normal = M @ self.normal
        self.u_axis = M @ self.u_axis
        self.v_axis = M @ self.v_axis


class Cylinder(Primitive):
    """Finite cylinder (optionally capped) — beyond the reference.

    `center` is the mid-height point, `axis` the length direction, `height`
    the full length.  `capped=True` closes both ends with discs (a closed
    surface with consistent enter/exit orientations — safe as a Refractive
    medium); `capped=False` is an open tube.  uv: the side maps azimuth to
    u and height to v; the caps map their local (x, z) to the same [0, 1]²
    square planarly.
    """

    def __init__(self, center, material, radius, height,
                 axis=(0.0, 1.0, 0.0), capped=True, u_axis=None,
                 max_ray_depth=5, shadow=True, mc=False):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        self.radius = float(radius)
        self.height = float(height)
        if self.radius <= 0 or self.height <= 0:
            raise ValueError("radius and height must be positive")
        self.axis = stable_unit(as_float3(axis, "axis"))
        # u_axis orients the side uv's azimuth origin (texture control;
        # also lets scene export round-trip rotated cylinders exactly)
        self.u_axis, self.v_axis = _orthonormal_frame(self.axis, u_axis)
        self.capped = bool(capped)
        self.bounded_sphere_radius = float(
            np.sqrt(self.radius ** 2 + (self.height / 2) ** 2))

    def _apply_rotation(self, M):
        self.axis = M @ self.axis
        self.u_axis = M @ self.u_axis
        self.v_axis = M @ self.v_axis


class Triangle(Primitive):
    """Single triangle (reference triangle.py:8-17)."""

    def __init__(self, center, material, p1, p2, p3, max_ray_depth=5, shadow=True, mc=False):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        self.p1 = as_float3(p1, "p1")
        self.p2 = as_float3(p2, "p2")
        self.p3 = as_float3(p3, "p3")
        e = np.stack([self.p1, self.p2, self.p3]) - self.center
        self.bounded_sphere_radius = float(np.max(np.linalg.norm(e, axis=1)))

    def _apply_rotation(self, M):
        self.p1 = self.center + M @ (self.p1 - self.center)
        self.p2 = self.center + M @ (self.p2 - self.center)
        self.p3 = self.center + M @ (self.p3 - self.center)


class TriangleMesh(Primitive):
    """Triangle mesh loaded from a Wavefront .obj (v/vt/vn/f records).

    The reference's TriangleMesh (triangle_mesh.py:12-43) is dead code — it
    references an undefined module and would raise NameError, and its parser
    reads only v/f lines.  This one works and goes further: texture
    coordinates (vt) drive material textures, and vertex normals give smooth
    shading via barycentric interpolation at the hit.

    smooth: None (default) honors the file's vn records when present (flat
    otherwise); True forces smooth shading (computing area-weighted vertex
    normals when the file has none); False forces flat shading.
    """

    def __init__(self, filename, center, material, scale=1.0,
                 max_ray_depth=5, shadow=True, mc=False, smooth=None):
        super().__init__(center, material, max_ray_depth, shadow=shadow, mc=mc)
        from ..native import parse_obj_full  # C++ fast path, Python fallback
        verts, uvs, norms, faces, face_uv, face_n = parse_obj_full(filename)
        # export metadata (scene_io.scene_to_dict)
        self.filename = str(filename)
        self.scale = float(scale)
        self.smooth_arg = smooth
        self.vertices = self.center + np.asarray(verts, dtype=np.float64) * scale
        self.faces = np.asarray(faces, dtype=np.int64)
        d = np.linalg.norm(self.vertices - self.center, axis=1)
        self.bounded_sphere_radius = float(d.max()) if len(d) else 0.0

        # (F, 3, 2) per-corner texture coordinates, honored whenever the file
        # has vt records (corners without a vt index read uv (0, 0))
        self.corner_uvs = None
        if len(uvs) and (face_uv >= 0).any():
            cu = np.asarray(uvs, np.float64)[np.clip(face_uv, 0, len(uvs) - 1)]
            cu[face_uv < 0] = 0.0
            self.corner_uvs = cu

        # (F, 3, 3) per-corner unit normals for smooth shading
        self.corner_normals = None
        has_vn = len(norms) and (face_n >= 0).any()
        if has_vn if smooth is None else smooth:
            if has_vn:
                cn = np.asarray(norms, np.float64)[
                    np.clip(face_n, 0, len(norms) - 1)]
                if (face_n < 0).any():    # mixed files: fill missing corners
                    vn = _vertex_normals(self.vertices, self.faces)
                    cn[face_n < 0] = vn[self.faces[face_n < 0]]
            else:
                vn = _vertex_normals(self.vertices, self.faces)
                cn = vn[self.faces]
            n = np.linalg.norm(cn, axis=-1, keepdims=True)
            self.corner_normals = cn / np.maximum(n, 1e-20)

    def _apply_rotation(self, M):
        self.vertices = self.center + (self.vertices - self.center) @ M.T
        if self.corner_normals is not None:
            self.corner_normals = self.corner_normals @ M.T

    @property
    def triangles(self):
        """(F, 3, 3) array of triangle vertices."""
        return self.vertices[self.faces]


class MeshInstances(Primitive):
    """Many rigid-transformed copies of one TriangleMesh sharing geometry.

    True instancing (the two-level "TLAS" the reference never had): the
    mesh's triangle tables are compiled ONCE in object space; each instance
    stores only a rotation, a translation and a uniform scale.  The clustered
    sweep intersects rays against an instance's clusters by transforming the
    ray tile into the instance's object space (rigid + uniform-scale maps
    preserve the ray's t-parameterization), so N instances of a T-triangle
    mesh cost O(T) table memory and host compile time, not O(N*T).

    Usage::

        forest = MeshInstances(tree_mesh)
        forest.add(translate=(x, 0, z), theta=40, axis=(0, 1, 0), scale=1.2)
        scene.add(forest)

    Each instance may carry its own material (default: the mesh's).
    Rotation is about the mesh's own center (like Primitive.rotate), applied
    before the translation.  Instanced scenes render on the jnp wavefront
    path with the two-level clustered sweep.
    """

    def __init__(self, mesh, material=None, max_ray_depth=None, shadow=None,
                 mc=None):
        super().__init__(
            mesh.center,
            material if material is not None else mesh.material,
            mesh.max_ray_depth if max_ray_depth is None else max_ray_depth,
            shadow=mesh.shadow if shadow is None else shadow,
            mc=mesh.mc if mc is None else mc)
        if not isinstance(mesh, TriangleMesh):
            raise TypeError("MeshInstances wraps a TriangleMesh")
        self.mesh = mesh
        # list of (rotation (3,3), translation (3,) in the canonical form
        # world = R @ (s * v) + t, scale s, material-or-None)
        self.instances = []

    def add(self, translate=(0.0, 0.0, 0.0), theta=0.0, axis=(0.0, 1.0, 0.0),
            scale=1.0, material=None, rotation=None):
        """Append one instance; returns self for chaining.

        rotation: optional explicit (3, 3) rotation matrix (overrides
        theta/axis).  scale must be positive (uniform only — a non-uniform
        scale would bend normals in a way the shared tables can't express).
        """
        s = float(scale)
        if s <= 0.0:
            raise ValueError("instance scale must be > 0")
        if rotation is not None:
            R = np.asarray(rotation, dtype=np.float64)
            if R.shape != (3, 3):
                raise ValueError("rotation must be a (3, 3) matrix")
        elif theta:
            R = rotation_matrix(theta, axis)
        else:
            R = np.eye(3)
        c = np.asarray(self.mesh.center, np.float64)
        # rotate/scale about the mesh center, then translate:
        # world = R @ ((v - c) * s) + c + translate  ==  R @ (s v) + t
        t = c + as_float3(translate, "translate") - s * (R @ c)
        self.instances.append((R, t, s, material))
        self._update_bounds()
        return self

    def _update_bounds(self):
        # aggregate bounding sphere over instances, for importance sampling
        c = np.asarray(self.mesh.center, np.float64)
        r = float(self.mesh.bounded_sphere_radius)
        centers = np.stack([R @ (s * c) + t for R, t, s, _ in self.instances])
        mid = centers.mean(axis=0)
        reach = np.linalg.norm(centers - mid, axis=1) + r * np.asarray(
            [s for _, _, s, _ in self.instances])
        self.center = mid
        self.bounded_sphere_radius = float(reach.max())


# The reference ships `Surface`, an unused near-duplicate of Primitive
# (sightpy/geometry/surface.py:6-42); provided as an alias for API parity.
Surface = Primitive


def _parse_obj(filename):
    verts, faces = [], []
    with open(filename) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "f":
                raw = [int(p.split("/")[0]) for p in parts[1:]]
                # negative OBJ indices are relative to the current vertex count
                idx = [r - 1 if r > 0 else len(verts) + r for r in raw]
                for k in range(1, len(idx) - 1):   # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return verts, faces


def _vertex_normals(verts, faces):
    """Area-weighted per-vertex normals (unnormalized face crosses summed at
    shared vertices — the standard smooth-shading default)."""
    v = np.asarray(verts, np.float64)
    fn = np.cross(v[faces[:, 1]] - v[faces[:, 0]],
                  v[faces[:, 2]] - v[faces[:, 0]])
    vn = np.zeros_like(v)
    for j in range(3):
        np.add.at(vn, faces[:, j], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-20)


def _parse_obj_full(filename):
    """Python fallback for native.parse_obj_full: v/vt/vn/f records.

    Returns (verts (V,3) f32, uvs (VT,2) f32, norms (VN,3) f32,
    faces/face_uv/face_n (F,3) i64; -1 marks a corner without vt/vn).
    """
    verts, uvs, norms = [], [], []
    faces, face_uv, face_n = [], [], []

    def corner(tok):
        fields = tok.split("/")
        v = int(fields[0])
        v = v - 1 if v > 0 else len(verts) + v
        t = n = -1
        if len(fields) > 1 and fields[1]:
            t = int(fields[1])
            t = t - 1 if t > 0 else len(uvs) + t
        if len(fields) > 2 and fields[2]:
            n = int(fields[2])
            n = n - 1 if n > 0 else len(norms) + n
        return v, t, n

    with open(filename) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "vt":
                uvs.append([float(parts[1]), float(parts[2])])
            elif parts[0] == "vn":
                norms.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "f":
                cs = [corner(p) for p in parts[1:]]
                for k in range(1, len(cs) - 1):   # fan-triangulate
                    tri = (cs[0], cs[k], cs[k + 1])
                    faces.append([c[0] for c in tri])
                    face_uv.append([c[1] for c in tri])
                    face_n.append([c[2] for c in tri])
    return (np.asarray(verts, np.float32).reshape(-1, 3),
            np.asarray(uvs, np.float32).reshape(-1, 2),
            np.asarray(norms, np.float32).reshape(-1, 3),
            np.asarray(faces, np.int64).reshape(-1, 3),
            np.asarray(face_uv, np.int64).reshape(-1, 3),
            np.asarray(face_n, np.int64).reshape(-1, 3))
