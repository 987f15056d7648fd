from . import colour, constants, image_io
