from .base import (Diffuse, Emissive, Glossy, Material, Refractive,
                   ThinFilmInterference)
from . import shade
