from .geo import (
    EARTH_RADIUS_KM,
    haversine_arg,
    haversine_deg,
    haversine_km,
    dist_threshold,
    lat_bin,
    lon_bin,
)
from .datetools import date_parts
from .qc import combine_qc, all_good
from .arrays import (
    array_mid,
    array_diff,
    array_cumsum,
    array_weighted_sum,
    dot_product,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "EARTH_RADIUS_KM",
    "haversine_arg",
    "haversine_deg",
    "haversine_km",
    "dist_threshold",
    "lat_bin",
    "lon_bin",
    "date_parts",
    "combine_qc",
    "all_good",
    "array_mid",
    "array_diff",
    "array_cumsum",
    "array_weighted_sum",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
