from .fdnunet import (
    FDNUNet,
    FDNUNetAuxDecoder,
    FDNUNetDecoder,
    FDNUNetEncoder,
    create_models,
)
from .unet import UNet

__all__ = [
    "FDNUNet",
    "FDNUNetAuxDecoder",
    "FDNUNetDecoder",
    "FDNUNetEncoder",
    "create_models",
    "UNet",
]
