"""CRS reprojection core: geographic (lon/lat) ↔ Albers Equal-Area
Conic, as pure Column expressions (SURVEY §1.1 scope extension).

The reference's largest tool reprojects every survey shapefile through
the GIS engine (SSURGO_ProjectSoilShapefilesbyAreasymbol.py:89-147
SetOutputCoordinateSystem + arcpy Project); the gSSURGO grids are
published in Albers (the CONUS workspace XML declares central meridian
−96°, standard parallels 29.5°/45.5°, latitude of origin 23°). Here the
portable math core is the classic spherical Albers forward/inverse pair
(Snyder, *Map Projections — A Working Manual*, USGS PP 1395, eqs.
14-1..14-11) — closed-form, JVM-side, no UDF:

    n  = (sin φ₁ + sin φ₂) / 2
    C  = cos²φ₁ + 2·n·sin φ₁
    ρ  = R·√(C − 2·n·sin φ) / n        θ = n·(λ − λ₀)
    x  = ρ·sin θ                        y = ρ₀ − ρ·cos θ

Inverse: ρ = √(x² + (ρ₀−y)²), θ = atan2(x, ρ₀−y),
φ = asin((C − (ρ·n/R)²) / (2n)), λ = λ₀ + θ/n.

Datum-shift caveat: production 5070 is ellipsoidal (GRS80, authalic
latitudes); the spherical form is the standard teaching/verification
core and keeps the expression closed-form. Swapping in the ellipsoidal
series is a per-row map — no change to the distributed plan.

Scale: map-only column math — no shuffle, no Python; a 100 TB
reprojection is one narrow stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AlbersParams:
    """Projection constants (degrees / meters)."""

    lat1: float = 29.5  # standard parallel 1 (CONUS 5070)
    lat2: float = 45.5  # standard parallel 2
    lat0: float = 23.0  # latitude of origin
    lon0: float = -96.0  # central meridian
    radius: float = 6370997.0  # authalic-ish sphere, Snyder's examples


CONUS = AlbersParams()


def _constants(p: AlbersParams) -> tuple[Column, Column, Column]:
    import math

    n = (math.sin(math.radians(p.lat1)) + math.sin(math.radians(p.lat2))) / 2.0
    c = math.cos(math.radians(p.lat1)) ** 2 + 2.0 * n * math.sin(
        math.radians(p.lat1)
    )
    rho0 = p.radius * math.sqrt(c - 2.0 * n * math.sin(math.radians(p.lat0))) / n
    return F.lit(n), F.lit(c), F.lit(rho0)


def albers_forward(
    lon: Column, lat: Column, p: AlbersParams = CONUS
) -> tuple[Column, Column]:
    """(lon°, lat°) → (x m, y m)."""
    n, c, rho0 = _constants(p)
    rho = F.lit(p.radius) * F.sqrt(c - 2.0 * n * F.sin(F.radians(lat))) / n
    theta = n * (F.radians(lon) - F.lit(__import__("math").radians(p.lon0)))
    return rho * F.sin(theta), rho0 - rho * F.cos(theta)


def albers_inverse(
    x: Column, y: Column, p: AlbersParams = CONUS
) -> tuple[Column, Column]:
    """(x m, y m) → (lon°, lat°)."""
    import math

    n, c, rho0 = _constants(p)
    rho = F.sqrt(x * x + (rho0 - y) * (rho0 - y))
    theta = F.atan2(x, rho0 - y)  # n > 0 for CONUS parallels
    lat = F.degrees(
        F.asin((c - (rho * n / F.lit(p.radius)) * (rho * n / F.lit(p.radius))) / (2.0 * n))
    )
    lon = F.lit(p.lon0) + F.degrees(theta / n)
    return lon, lat
