from .hashing import sha256_arrow, sha256_col
from .astro import angular_distance_deg, flux_to_magnitude, magnitude_to_flux

__all__ = [
    "sha256_arrow",
    "sha256_col",
    "angular_distance_deg",
    "flux_to_magnitude",
    "magnitude_to_flux",
]
