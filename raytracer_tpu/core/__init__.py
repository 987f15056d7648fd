# NOTE: kept import-light to avoid cycles (scene -> backgrounds -> geometry
# -> core.vec would re-enter this package mid-init).  Import submodules
# directly: raytracer_tpu.core.scene, .camera, .integrator, ...
from .vec import rgb, vec3
