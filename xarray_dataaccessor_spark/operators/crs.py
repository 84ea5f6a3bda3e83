"""General CRS reprojection without pyproj (R2/R4, SURVEY §2.6).

The reference's ``convert_crs`` (``shared_functions.py:132-157``) accepts
any EPSG via rioxarray/pyproj. Here the common projected CRS families get
closed-form transforms that run as **pure Spark column expressions**
(whole-stage codegen, no Python in the hot path):

- EPSG:4326 <-> EPSG:3857 (spherical Web Mercator) — ``spatial.py``
- EPSG:4326 <-> UTM zones (EPSG 326xx north / 327xx south) — the
  Karney–Krüger series for the ellipsoidal Transverse Mercator
  (public algorithm: Karney 2011, "Transverse Mercator with an
  accuracy of a few nanometers"; coefficients to n^6 give sub-mm
  accuracy across a UTM zone's width)

Anything else falls back to the pyproj-gated pandas UDF in
``spatial.transform_crs_udf``. The same series evaluated with driver-side
``math`` powers bbox-corner reprojection (R5) so filters can be pushed
down in the projected frame.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# WGS84 defining parameters (public: NGA/EPSG)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def _kruger_coefficients(n: float):
    """alpha (forward) and beta (inverse) Krüger series coefficients to
    n^6 — the published expansion (Karney 2011, eqs. 35-36)."""
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    )
    return alpha, beta


@dataclass(frozen=True)
class TransverseMercator:
    """One UTM-style projection: central meridian + scale + false offsets
    over WGS84. All derived constants are plain floats so both the Spark
    column expressions and the driver-side scalar math embed them as
    literals."""

    lon0_deg: float
    k0: float = 0.9996
    false_easting: float = 500_000.0
    false_northing: float = 0.0

    @property
    def _consts(self):
        f = WGS84_F
        n = f / (2.0 - f)
        # rectifying radius A (Karney eq. 14)
        big_a = WGS84_A / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        e = math.sqrt(f * (2 - f))
        alpha, beta = _kruger_coefficients(n)
        return e, big_a, alpha, beta

    # -- driver-side scalars (bbox corners, tests) ------------------------

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        e, big_a, alpha, _ = self._consts
        lam = math.radians(lon - self.lon0_deg)
        phi = math.radians(lat)
        s = math.sin(phi)
        t = math.sinh(math.atanh(s) - e * math.atanh(e * s))
        xi_p = math.atan2(t, math.cos(lam))
        eta_p = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
        xi = xi_p + sum(
            a * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
            for j, a in enumerate(alpha, start=1)
        )
        eta = eta_p + sum(
            a * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
            for j, a in enumerate(alpha, start=1)
        )
        return (
            self.false_easting + self.k0 * big_a * eta,
            self.false_northing + self.k0 * big_a * xi,
        )

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        e, big_a, _, beta = self._consts
        xi = (y - self.false_northing) / (self.k0 * big_a)
        eta = (x - self.false_easting) / (self.k0 * big_a)
        xi_p = xi - sum(
            b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
            for j, b in enumerate(beta, start=1)
        )
        eta_p = eta - sum(
            b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
            for j, b in enumerate(beta, start=1)
        )
        tau_p = math.sin(xi_p) / math.hypot(math.sinh(eta_p), math.cos(xi_p))
        lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
        # Newton on tau = tan(phi) (Karney eqs. 19-21); 2 iterations reach
        # double precision
        tau = tau_p
        for _ in range(3):
            sig = math.sinh(e * math.atanh(e * tau / math.hypot(1.0, tau)))
            f_tau = tau * math.hypot(1.0, sig) - sig * math.hypot(1.0, tau)
            d_tau = (
                (math.hypot(1.0, sig) * math.hypot(1.0, tau) - sig * tau)
                * (1 - e * e)
                * math.hypot(1.0, tau)
                / (1 + (1 - e * e) * tau * tau)
            )
            tau += (tau_p - f_tau) / d_tau
        return (
            self.lon0_deg + math.degrees(lam),
            math.degrees(math.atan(tau)),
        )

    # -- Spark column expressions (the distributed path) ------------------

    def forward_cols(self, lon: Column, lat: Column) -> tuple[Column, Column]:
        """(easting, northing) as built-in column expressions — the whole
        series stays in whole-stage codegen; no UDF."""
        e, big_a, alpha, _ = self._consts
        lam = F.radians(lon - F.lit(self.lon0_deg))
        phi = F.radians(lat)
        s = F.sin(phi)
        t = F.sinh(F.atanh(s) - F.lit(e) * F.atanh(F.lit(e) * s))
        hyp = F.sqrt(t * t + F.cos(lam) * F.cos(lam))
        xi_p = F.atan2(t, F.cos(lam))
        eta_p = F.asinh(F.sin(lam) / hyp)
        xi, eta = xi_p, eta_p
        for j, a in enumerate(alpha, start=1):
            xi = xi + F.lit(a) * F.sin(F.lit(2.0 * j) * xi_p) * F.cosh(F.lit(2.0 * j) * eta_p)
            eta = eta + F.lit(a) * F.cos(F.lit(2.0 * j) * xi_p) * F.sinh(F.lit(2.0 * j) * eta_p)
        return (
            F.lit(self.false_easting) + F.lit(self.k0 * big_a) * eta,
            F.lit(self.false_northing) + F.lit(self.k0 * big_a) * xi,
        )

    def inverse_cols(self, x: Column, y: Column) -> tuple[Column, Column]:
        """(lon, lat) from projected metres. Unlike the driver-side
        scalar inverse (Newton on tan(phi), machine precision), the
        column path recovers phi from the conformal latitude with the
        published direct series in e^2 (terms to e^8, error O(e^10)
        ~ 1e-11 rad ~ sub-0.1 mm) — an unrolled Newton loop would nest
        the tau expression recursively and blow the Catalyst tree up
        exponentially (minutes of planning time)."""
        e, big_a, _, beta = self._consts
        xi = (y - F.lit(self.false_northing)) / F.lit(self.k0 * big_a)
        eta = (x - F.lit(self.false_easting)) / F.lit(self.k0 * big_a)
        xi_p, eta_p = xi, eta
        for j, b in enumerate(beta, start=1):
            xi_p = xi_p - F.lit(b) * F.sin(F.lit(2.0 * j) * xi) * F.cosh(F.lit(2.0 * j) * eta)
            eta_p = eta_p - F.lit(b) * F.cos(F.lit(2.0 * j) * xi) * F.sinh(F.lit(2.0 * j) * eta)
        tau_p = F.sin(xi_p) / F.sqrt(F.sinh(eta_p) * F.sinh(eta_p) + F.cos(xi_p) * F.cos(xi_p))
        lam = F.atan2(F.sinh(eta_p), F.cos(xi_p))
        # chi = conformal latitude; phi = chi + sum d_j sin(2j chi)
        chi = F.atan(tau_p)
        e2 = e * e
        d = (
            e2 / 2 + 5 * e2**2 / 24 + e2**3 / 12 + 13 * e2**4 / 360,
            7 * e2**2 / 48 + 29 * e2**3 / 240 + 811 * e2**4 / 11520,
            7 * e2**3 / 120 + 81 * e2**4 / 1120,
            4279 * e2**4 / 161280,
        )
        phi = chi
        for j, dj in enumerate(d, start=1):
            phi = phi + F.lit(dj) * F.sin(F.lit(2.0 * j) * chi)
        return (
            F.lit(self.lon0_deg) + F.degrees(lam),
            F.degrees(phi),
        )


@dataclass(frozen=True)
class Sinusoidal:
    """Spherical sinusoidal projection (Snyder 1987, "Map Projections —
    A Working Manual", eqs. 30-1/30-2): ``x = R*lam*cos(phi)``,
    ``y = R*phi``. This is the native CRS of the LP-DAAC MODIS products
    the reference ingests (``nasa_from_LPDAAC.py:233-238``) — MODIS uses
    a SPHERE of radius 6371007.181 m (the authalic radius), not the
    WGS84 ellipsoid. Closed form both ways, pure column expressions."""

    radius: float
    lon0_deg: float = 0.0

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        lam = math.radians(lon - self.lon0_deg)
        phi = math.radians(lat)
        return self.radius * lam * math.cos(phi), self.radius * phi

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        phi = y / self.radius
        lam = x / (self.radius * math.cos(phi))
        return self.lon0_deg + math.degrees(lam), math.degrees(phi)

    def forward_cols(self, lon: Column, lat: Column) -> tuple[Column, Column]:
        lam = F.radians(lon - F.lit(self.lon0_deg))
        phi = F.radians(lat)
        return (
            F.lit(self.radius) * lam * F.cos(phi),
            F.lit(self.radius) * phi,
        )

    def inverse_cols(self, x: Column, y: Column) -> tuple[Column, Column]:
        phi = y / F.lit(self.radius)
        lam = x / (F.lit(self.radius) * F.cos(phi))
        return (
            F.lit(self.lon0_deg) + F.degrees(lam),
            F.degrees(phi),
        )


# MODIS sinusoidal has no EPSG code; the conventional identifiers are
# SR-ORG:6974 (MODIS sphere, authalic radius) and ESRI:53008
# (Sphere_Sinusoidal, R=6371000). Both are spheres, so one closed form
# serves both.
MODIS_SINUSOIDAL = 6974
_SINUSOIDAL_RADII = {6974: 6371007.181, 53008: 6371000.0}


def sinusoidal_crs(code: int) -> Sinusoidal | None:
    """SR-ORG:6974 (MODIS) / ESRI:53008 -> projection; None otherwise."""
    r = _SINUSOIDAL_RADII.get(code)
    return Sinusoidal(radius=r) if r is not None else None


def projected_crs(code: int):
    """Closed-form projection registry: WGS84 UTM zones + spherical
    sinusoidal. Returns an object with forward/inverse (+ _cols twins)
    or None."""
    return utm_crs(code) or sinusoidal_crs(code)


def utm_crs(epsg: int) -> TransverseMercator | None:
    """EPSG 32601-32660 (UTM north) / 32701-32760 (UTM south) ->
    projection params; None when the code is not a WGS84 UTM zone."""
    if 32601 <= epsg <= 32660:
        zone, south = epsg - 32600, False
    elif 32701 <= epsg <= 32760:
        zone, south = epsg - 32700, True
    else:
        return None
    return TransverseMercator(
        lon0_deg=zone * 6.0 - 183.0,
        false_northing=10_000_000.0 if south else 0.0,
    )


def transform_grid(
    df: DataFrame, from_epsg: int, to_epsg: int, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Closed-form CRS transform over grid columns (4326 <-> any WGS84
    UTM zone or spherical sinusoidal). Raises KeyError when the pair has
    no closed form here — callers (``spatial.transform_crs_udf``) then
    try the pyproj gate."""
    proj_to = projected_crs(to_epsg)
    proj_from = projected_crs(from_epsg)
    if from_epsg == 4326 and proj_to is not None:
        ex, ny = proj_to.forward_cols(F.col(x_col), F.col(y_col))
        return df.withColumn("__e", ex).withColumn(y_col, ny).withColumn(
            x_col, F.col("__e")
        ).drop("__e")
    if proj_from is not None and to_epsg == 4326:
        lon, lat = proj_from.inverse_cols(F.col(x_col), F.col(y_col))
        return df.withColumn("__lon", lon).withColumn(y_col, lat).withColumn(
            x_col, F.col("__lon")
        ).drop("__lon")
    if proj_from is not None and proj_to is not None:
        # projected -> projected via the geographic pivot, still closed-form
        return transform_grid(
            transform_grid(df, from_epsg, 4326, x_col, y_col), 4326, to_epsg, x_col, y_col
        )
    raise KeyError(f"No closed-form transform {from_epsg} -> {to_epsg}")


def transform_point(lon_or_x: float, lat_or_y: float, from_epsg: int, to_epsg: int):
    """Driver-side scalar transform for bbox corners (R5) and point
    extraction, same series as the distributed path."""
    proj_to = projected_crs(to_epsg)
    proj_from = projected_crs(from_epsg)
    if from_epsg == 4326 and proj_to is not None:
        return proj_to.forward(lon_or_x, lat_or_y)
    if proj_from is not None and to_epsg == 4326:
        return proj_from.inverse(lon_or_x, lat_or_y)
    if proj_from is not None and proj_to is not None:
        lon, lat = proj_from.inverse(lon_or_x, lat_or_y)
        return proj_to.forward(lon, lat)
    raise KeyError(f"No closed-form transform {from_epsg} -> {to_epsg}")
