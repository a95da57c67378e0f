from nerfjax.fields.encodings import fourier_encode, fourier_output_dim, sh4_encode
from nerfjax.fields.vanilla import VanillaNeRF
from nerfjax.fields.ngp import InstantNGP

__all__ = [
    "fourier_encode",
    "fourier_output_dim",
    "sh4_encode",
    "VanillaNeRF",
    "InstantNGP",
]
