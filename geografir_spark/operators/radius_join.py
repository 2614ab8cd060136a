"""Distance-band (radius) spatial join: all point pairs within R meters on
the sphere — the third leg of the spatial-join family next to the PIP join
(operators/pip_join.py) and the kNN join (operators/knn.py).

Shape: latitude-band equi-join prefilter → conservative longitude prune →
exact haversine refine. The prefilter is PROVABLY complete:

* great-circle distance d >= EARTH_R * |Δφ|, so d <= R implies
  |Δlat_deg| <= R / M_PER_DEG — adjacent lat bands of width R/M_PER_DEG
  suffice (left rows explode into {b-1, b, b+1}: one shuffle keyed by an
  integer band, never a theta join).
* with h = sin²(Δφ/2) + cosφ₁cosφ₂·sin²(Δλ/2), d = 2R·asin(√h)
  >= 2R·√(cosφ₁cosφ₂)·|sin(Δλ/2)| >= (2R/π)·√(cosφ₁cosφ₂)·Δλ_wrapped,
  so d <= R implies Δλ_wrapped <= π·R_m/(2R·√(cosφ₁cosφ₂)). The prune
  evaluates this JVM-side with a 1e-9 relative slack (JVM cos may differ
  from libm in the last ulp; the slack keeps the bound conservative, and
  membership is decided only by the exact refine).

Float-determinism: the refined half-chord ``hav`` is built ONLY from
sin/cos/±/× — measured bit-identical between numpy and DuckDB's libm on
this container (asin chains are NOT, so the emitted value and the
threshold stay in h-space: d <= R ⇔ hav <= sin²(R/(2·EARTH_R)), the
threshold embedded as the same repr literal on both engines). The refine
runs as an Arrow-batched pandas UDF (ArrowEvalPython — allowed by the
plan-purity gate; BatchEvalPython never appears).

Scale: one shuffle on the integer band key. Band width tracks R, so small
radii get many bands (parallelism) while large radii concentrate rows —
the documented refinement for continent-scale R is appending a longitude
bucket to the key at low |lat| (same salting machinery as operators/skew).
Per-task work after the prune is linear in surviving candidates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_R = 6371000.0
M_PER_DEG = 111194.92664455873  # pi * EARTH_R / 180


def hav_tau(radius_m: float) -> float:
    """Half-chord threshold: d <= radius ⇔ hav <= sin²(radius/(2R))."""
    import math

    s = math.sin(radius_m / (2.0 * EARTH_R))
    return s * s


def hav_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The squared-half-chord formula as shared-dialect SQL — the literal
    op order the numpy refine mirrors (sin/cos/±/× only; no asin)."""
    s1 = f"sin(radians({lat2} - {lat1}) / 2.0)"
    s2 = f"sin(radians({lon2} - {lon1}) / 2.0)"
    return f"{s1} * {s1} + cos(radians({lat1})) * cos(radians({lat2})) * {s2} * {s2}"


def _hav_np(lat1, lon1, lat2, lon2):
    """numpy twin of hav_sql — identical association order."""
    s1 = np.sin(np.radians(lat2 - lat1) / 2.0)
    s2 = np.sin(np.radians(lon2 - lon1) / 2.0)
    return s1 * s1 + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * s2 * s2


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    *,
    left_id: str = "a_id",
    right_id: str = "b_id",
    left_lon: str = "a_lon",
    left_lat: str = "a_lat",
    right_lon: str = "b_lon",
    right_lat: str = "b_lat",
) -> DataFrame:
    """All (left, right) pairs within ``radius_m`` meters great-circle
    distance. Returns (left_id, right_id, hav) — ``hav`` is the exact
    squared half-chord (monotone in distance; callers wanting meters apply
    2·R·asin(√hav) knowing asin is not cross-engine exact)."""
    from pyspark.sql.functions import pandas_udf

    band_deg = radius_m / M_PER_DEG
    tau = hav_tau(radius_m)

    lb = left.withColumn(
        "__band",
        F.explode(
            F.array(
                F.floor(F.col(left_lat) / F.lit(band_deg)) - 1,
                F.floor(F.col(left_lat) / F.lit(band_deg)),
                F.floor(F.col(left_lat) / F.lit(band_deg)) + 1,
            )
        ),
    )
    rb = right.withColumn("__band", F.floor(F.col(right_lat) / F.lit(band_deg)))

    pairs = lb.join(rb, "__band", "inner")

    # conservative longitude prune (JVM trig + slack; never decides membership)
    dlon = F.abs(F.col(left_lon) - F.col(right_lon))
    dlon_wrapped = F.least(dlon, F.lit(360.0) - dlon)
    cos_prod = F.greatest(
        F.cos(F.radians(F.col(left_lat))) * F.cos(F.radians(F.col(right_lat))),
        F.lit(1e-30),
    )
    bound_deg = F.degrees(
        F.lit(np.pi * radius_m * (1.0 + 1e-9) / (2.0 * EARTH_R)) / F.sqrt(cos_prod)
    )
    pairs = pairs.filter(dlon_wrapped <= bound_deg)

    @pandas_udf("double")
    def hav_udf(lat1, lon1, lat2, lon2):
        import pandas as pd

        return pd.Series(
            _hav_np(
                lat1.to_numpy(dtype=np.float64),
                lon1.to_numpy(dtype=np.float64),
                lat2.to_numpy(dtype=np.float64),
                lon2.to_numpy(dtype=np.float64),
            )
        )

    return (
        pairs.withColumn(
            "hav",
            hav_udf(F.col(left_lat), F.col(left_lon), F.col(right_lat), F.col(right_lon)),
        )
        .filter(F.col("hav") <= F.lit(tau))
        .select(left_id, right_id, "hav")
    )
