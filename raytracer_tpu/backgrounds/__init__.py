from .environment import EnvironmentMaterial, Panorama, SkyBox, procedural_sky
