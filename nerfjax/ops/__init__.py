from nerfjax.ops.hash_encode import hash_encode_planar
from nerfjax.ops.otsu import otsu_threshold

__all__ = ["hash_encode_planar", "otsu_threshold"]
