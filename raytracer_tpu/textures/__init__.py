from .texture import image, solid_color, texture
