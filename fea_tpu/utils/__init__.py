from .device import raster_device

__all__ = ["raster_device"]
