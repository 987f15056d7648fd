from .primitive import (Cuboid, Plane, Primitive, Sphere, Triangle,
                        TriangleMesh, rotation_matrix)
from . import attrs, intersect
