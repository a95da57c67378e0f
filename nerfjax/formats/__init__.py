from nerfjax.formats.tiff import write_tiff_volume
from nerfjax.formats.vti import write_vti_volume

__all__ = ["write_tiff_volume", "write_vti_volume"]
