from .locate import Frame, PixelMap, build_pixel_map, make_frame
from .rasterizer import (
    field_image,
    geometry_image,
    node_splat_image,
    outline_image,
    region_image,
    scalar_range,
)

__all__ = [
    "Frame",
    "PixelMap",
    "build_pixel_map",
    "make_frame",
    "field_image",
    "geometry_image",
    "node_splat_image",
    "outline_image",
    "region_image",
    "scalar_range",
]
