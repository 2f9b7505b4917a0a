"""General CRS transforms from scratch — vectorized numpy map projections.

Closes the "CRS limited to 3857<->4326" gap: the reference reprojects every
shapefile/geopackage source to EPSG:4326 through GeoTools
(ShapefileReader.java:65-68 `findMathTransform(src, CRS.decode("EPSG:4326"))`;
GeoUtils.decodeCRS:768-791 accepts `EPSG:n` codes and WKT). No proj/GDAL lib
exists in this container, so the math is implemented directly from the public
formulations:

  - ellipsoidal projection formulas: Snyder, "Map Projections — A Working
    Manual", USGS Professional Paper 1395 (public domain) — Mercator (7),
    Lambert Conformal Conic (15), Polar Stereographic (21), Albers (14),
    Lambert Azimuthal Equal-Area (24);
  - Transverse Mercator: the Krueger n-series (alpha/beta coefficients to
    n^6) as published in Karney 2011 "Transverse Mercator with an accuracy
    of a few nanometers" and the standard public references — sub-mm within
    +-40 degrees of the central meridian (covers every UTM/Gauss-Krueger/
    national-grid use);
  - datum shifts: EPSG position-vector 7-parameter Helmert via ECEF,
    geodetic<->ECEF with Bowring's initial guess + one Newton step.

Everything is vectorized over numpy arrays (radians internal, degrees at the
API edge) so executors reproject whole record batches per call — the same
batch shape as every other kernel here (no per-row Python in the hot path).

API surface (mirrors GeoUtils.decodeCRS + GeoTools MathTransform):
  decode_crs("EPSG:32633" | wkt_text) -> CRS
  CRS.to_wgs84(x, y)   -> (lon, lat) degrees      (inverse projection + datum)
  CRS.from_wgs84(lon, lat) -> (x, y)              (datum + forward projection)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

__all__ = ["CRS", "Ellipsoid", "decode_crs", "crs_from_epsg", "crs_from_wkt",
           "WGS84", "GRS80"]

_D2R = np.pi / 180.0
_R2D = 180.0 / np.pi


# --- ellipsoids ---------------------------------------------------------------

@dataclass(frozen=True)
class Ellipsoid:
    a: float                      # semi-major axis (m)
    inv_f: float                  # inverse flattening (0 -> sphere)

    @property
    def f(self) -> float:
        return 0.0 if self.inv_f == 0 else 1.0 / self.inv_f

    @property
    def e2(self) -> float:
        f = self.f
        return f * (2.0 - f)

    @property
    def e(self) -> float:
        return float(np.sqrt(self.e2))

    @property
    def n3(self) -> float:
        """Third flattening n = f / (2 - f)."""
        f = self.f
        return f / (2.0 - f)


WGS84 = Ellipsoid(6378137.0, 298.257223563)
GRS80 = Ellipsoid(6378137.0, 298.257222101)
_ELLIPSOIDS = {
    # matched by (a, 1/f) from WKT SPHEROID with loose tolerance; named here
    # only for readability — arbitrary (a, 1/f) pairs work as-is
    "WGS84": WGS84,
    "GRS80": GRS80,
    "Clarke 1866": Ellipsoid(6378206.4, 294.978698214),
    "Airy 1830": Ellipsoid(6377563.396, 299.3249646),
    "Bessel 1841": Ellipsoid(6377397.155, 299.1528128),
    "International 1924": Ellipsoid(6378388.0, 297.0),
    "Krassowsky 1940": Ellipsoid(6378245.0, 298.3),
    "Sphere": Ellipsoid(6371000.0, 0.0),
}


# --- shared ellipsoidal helpers (Snyder 3-1, 7-9, 14-15, 3-5) ----------------

def _m(sinp, cosp, e2):
    """Snyder 14-15: m(phi) = cos phi / sqrt(1 - e^2 sin^2 phi)."""
    return cosp / np.sqrt(1.0 - e2 * sinp * sinp)


def _t(phi, e):
    """Snyder 15-9: isometric colatitude t(phi)."""
    sinp = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * sinp) / (1.0 + e * sinp)) ** (e / 2.0))


def _phi_from_chi(chi, e2):
    """Conformal -> geodetic latitude, series to e^8 (Snyder 3-5)."""
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e6 * e2
    return (chi
            + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
            + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
            + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
            + (4279 * e8 / 161280) * np.sin(8 * chi))


def _q(phi, e, e2):
    """Snyder 3-12: authalic q(phi)."""
    sinp = np.sin(phi)
    if e == 0.0:
        return 2.0 * sinp
    return (1.0 - e2) * (sinp / (1.0 - e2 * sinp * sinp)
                         - (1.0 / (2.0 * e)) * np.log((1.0 - e * sinp) / (1.0 + e * sinp)))


def _phi_from_beta(beta, e2):
    """Authalic -> geodetic latitude, series to e^6 (Snyder 3-18)."""
    e4 = e2 * e2
    e6 = e4 * e2
    return (beta
            + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
            + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
            + (761 * e6 / 45360) * np.sin(6 * beta))


def _wrap_lon(lam):
    """Wrap to (-pi, pi]."""
    return lam - 2.0 * np.pi * np.floor((lam + np.pi) / (2.0 * np.pi))


# --- projections --------------------------------------------------------------

class _Projection:
    """Forward/inverse between geodetic radians (on self.ell) and meters."""

    ell: Ellipsoid

    def forward(self, lam, phi):   # -> (x, y) meters
        raise NotImplementedError

    def inverse(self, x, y):       # -> (lam, phi) radians
        raise NotImplementedError


class Geographic(_Projection):
    """Identity 'projection': x=lon deg, y=lat deg (EPSG:4326 axis order
    normalized to lon/lat, as the reference forces with CRS.decode(code, true),
    ShapefileReader.java:68)."""

    def __init__(self, ell: Ellipsoid = WGS84):
        self.ell = ell

    def forward(self, lam, phi):
        return lam * _R2D, phi * _R2D

    def inverse(self, x, y):
        return np.asarray(x, dtype=np.float64) * _D2R, np.asarray(y, dtype=np.float64) * _D2R


class Mercator(_Projection):
    """Snyder 7: ellipsoidal Mercator 1SP (k0) / 2SP (lat_ts)."""

    def __init__(self, ell, lon0=0.0, k0=1.0, lat_ts=None, fe=0.0, fn=0.0):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        if lat_ts is not None:
            phis = lat_ts * _D2R
            k0 = float(_m(np.sin(phis), np.cos(phis), ell.e2))
        self.k0 = k0
        self.fe, self.fn = fe, fn

    def forward(self, lam, phi):
        a, e = self.ell.a, self.ell.e
        x = a * self.k0 * _wrap_lon(lam - self.lam0)
        y = -a * self.k0 * np.log(_t(phi, e))
        return x + self.fe, y + self.fn

    def inverse(self, x, y):
        a, e2 = self.ell.a, self.ell.e2
        t = np.exp(-(np.asarray(y, dtype=np.float64) - self.fn) / (a * self.k0))
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = _phi_from_chi(chi, e2)
        lam = self.lam0 + (np.asarray(x, dtype=np.float64) - self.fe) / (a * self.k0)
        return lam, phi


class WebMercator(Mercator):
    """EPSG:3857 — spherical formulas on the WGS84 semi-major axis."""

    def __init__(self):
        super().__init__(Ellipsoid(WGS84.a, 0.0))
        self.datum_ell = WGS84   # coordinates are WGS84 geodetic despite the sphere


class TransverseMercator(_Projection):
    """Krueger n-series transverse Mercator (alpha/beta to n^6) — the exact
    public coefficients from Karney 2011 eq. 35/36; error < 1 mm within
    +-40 deg of lon0. Handles UTM, Gauss-Krueger, OSGB, and every
    `Transverse_Mercator` .prj."""

    def __init__(self, ell, lon0=0.0, lat0=0.0, k0=1.0, fe=0.0, fn=0.0):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        self.k0 = k0
        self.fe, self.fn = fe, fn
        n = ell.n3
        n2, n3_, n4, n5, n6 = n * n, n ** 3, n ** 4, n ** 5, n ** 6
        self.A = ell.a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
        self.alpha = np.array([
            n / 2 - 2 * n2 / 3 + 5 * n3_ / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3_ / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
            61 * n3_ / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ])
        self.beta = np.array([
            n / 2 - 2 * n2 / 3 + 37 * n3_ / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
            n2 / 48 + n3_ / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
            17 * n3_ / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ])
        # meridian-arc offset of lat0 (0 for UTM; 49 deg for OSGB etc.):
        # forward xi at (lat0, lam'=0)
        self.xi0 = 0.0
        if lat0 != 0.0:
            self.xi0 = float(self._xi_eta(np.array([lat0 * _D2R]), np.array([0.0]))[0][0])

    def _xi_eta(self, phi, dlam):
        e = self.ell.e
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        xi_p = np.arctan2(t, np.cos(dlam))
        eta_p = np.arcsinh(np.sin(dlam) / np.hypot(t, np.cos(dlam)))
        j = np.arange(1, 7)
        two_j_xi = 2.0 * j[:, None] * xi_p[None, :]
        two_j_eta = 2.0 * j[:, None] * eta_p[None, :]
        xi = xi_p + np.einsum("j,jn->n", self.alpha, np.sin(two_j_xi) * np.cosh(two_j_eta))
        eta = eta_p + np.einsum("j,jn->n", self.alpha, np.cos(two_j_xi) * np.sinh(two_j_eta))
        return xi, eta

    def forward(self, lam, phi):
        phi = np.atleast_1d(np.asarray(phi, dtype=np.float64))
        dlam = _wrap_lon(np.atleast_1d(np.asarray(lam, dtype=np.float64)) - self.lam0)
        xi, eta = self._xi_eta(phi, dlam)
        x = self.fe + self.k0 * self.A * eta
        y = self.fn + self.k0 * self.A * (xi - self.xi0)
        return x, y

    def inverse(self, x, y):
        e2 = self.ell.e2
        xi = (np.atleast_1d(np.asarray(y, dtype=np.float64)) - self.fn) / (self.k0 * self.A) + self.xi0
        eta = (np.atleast_1d(np.asarray(x, dtype=np.float64)) - self.fe) / (self.k0 * self.A)
        j = np.arange(1, 7)
        two_j_xi = 2.0 * j[:, None] * xi[None, :]
        two_j_eta = 2.0 * j[:, None] * eta[None, :]
        xi_p = xi - np.einsum("j,jn->n", self.beta, np.sin(two_j_xi) * np.cosh(two_j_eta))
        eta_p = eta - np.einsum("j,jn->n", self.beta, np.cos(two_j_xi) * np.sinh(two_j_eta))
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = _phi_from_chi(chi, e2)
        # one Newton step on tan(chi') = tan(phi) * f(phi) tightens the series
        # to float64 round-off (matters only for |phi| near the poles)
        e = self.ell.e
        s = np.sin(phi)
        tau_p = np.tan(chi)
        tau = np.tan(phi)
        sig = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
        f = tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau) - tau_p
        df = ((np.hypot(1.0, sig) * np.hypot(1.0, tau) - sig * tau)
              * (1.0 - e2) * np.hypot(1.0, tau) / (1.0 + (1.0 - e2) * tau * tau))
        with np.errstate(invalid="ignore", divide="ignore"):
            upd = np.where(df != 0, f / df, 0.0)
        phi = np.arctan(tau - upd)
        lam = self.lam0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return lam, phi


class LambertConformalConic(_Projection):
    """Snyder 15: LCC 2SP (sp1, sp2) or 1SP (sp1 == sp2 or k0 given)."""

    def __init__(self, ell, lon0, lat0, sp1, sp2=None, k0=1.0, fe=0.0, fn=0.0):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        self.fe, self.fn = fe, fn
        e, e2 = ell.e, ell.e2
        p1 = sp1 * _D2R
        p2 = (sp2 if sp2 is not None else sp1) * _D2R
        p0 = lat0 * _D2R
        m1 = float(_m(np.sin(p1), np.cos(p1), e2))
        t1 = float(_t(np.asarray(p1), e))
        t0 = float(_t(np.asarray(p0), e))
        if abs(p1 - p2) > 1e-12:
            m2 = float(_m(np.sin(p2), np.cos(p2), e2))
            t2 = float(_t(np.asarray(p2), e))
            self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        else:
            self.n = float(np.sin(p1))
        self.F = k0 * m1 / (self.n * t1 ** self.n)
        self.rho0 = ell.a * self.F * t0 ** self.n

    def forward(self, lam, phi):
        a, e = self.ell.a, self.ell.e
        t = _t(np.asarray(phi, dtype=np.float64), e)
        rho = a * self.F * t ** self.n
        th = self.n * _wrap_lon(np.asarray(lam, dtype=np.float64) - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        a, e2 = self.ell.a, self.ell.e2
        xp = np.asarray(x, dtype=np.float64) - self.fe
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(xp, yp)
        th = np.arctan2(np.sign(self.n) * xp, np.sign(self.n) * yp)
        with np.errstate(divide="ignore"):
            t = (rho / (a * self.F)) ** (1.0 / self.n)
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        return self.lam0 + th / self.n, _phi_from_chi(chi, e2)


class AlbersEqualArea(_Projection):
    """Snyder 14: Albers conic equal-area, 2 standard parallels."""

    def __init__(self, ell, lon0, lat0, sp1, sp2, fe=0.0, fn=0.0):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        self.fe, self.fn = fe, fn
        e, e2 = ell.e, ell.e2
        p1, p2, p0 = sp1 * _D2R, sp2 * _D2R, lat0 * _D2R
        m1 = float(_m(np.sin(p1), np.cos(p1), e2))
        m2 = float(_m(np.sin(p2), np.cos(p2), e2))
        q1, q2, q0 = (float(_q(np.asarray(p), e, e2)) for p in (p1, p2, p0))
        if abs(p1 - p2) > 1e-12:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        else:
            self.n = float(np.sin(p1))
        self.C = m1 * m1 + self.n * q1
        self.rho0 = ell.a * np.sqrt(self.C - self.n * q0) / self.n
        self.qp = float(_q(np.asarray(np.pi / 2.0), e, e2))

    def forward(self, lam, phi):
        a, e, e2 = self.ell.a, self.ell.e, self.ell.e2
        q = _q(np.asarray(phi, dtype=np.float64), e, e2)
        rho = a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * _wrap_lon(np.asarray(lam, dtype=np.float64) - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        a, e2 = self.ell.a, self.ell.e2
        xp = np.asarray(x, dtype=np.float64) - self.fe
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.hypot(xp, yp)
        th = np.arctan2(np.sign(self.n) * xp, np.sign(self.n) * yp)
        q = (self.C - (rho * self.n / a) ** 2) / self.n
        beta = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        return self.lam0 + th / self.n, _phi_from_beta(beta, e2)


class LambertAzimuthalEqualArea(_Projection):
    """Snyder 24: ellipsoidal LAEA, oblique aspect (EPSG:3035 etc.)."""

    def __init__(self, ell, lon0, lat0, fe=0.0, fn=0.0):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        self.fe, self.fn = fe, fn
        e, e2 = ell.e, ell.e2
        p0 = lat0 * _D2R
        self.qp = float(_q(np.asarray(np.pi / 2.0), e, e2))
        q0 = float(_q(np.asarray(p0), e, e2))
        self.beta0 = float(np.arcsin(np.clip(q0 / self.qp, -1.0, 1.0)))
        self.Rq = ell.a * np.sqrt(self.qp / 2.0)
        m0 = float(_m(np.sin(p0), np.cos(p0), e2))
        self.D = ell.a * m0 / (self.Rq * np.cos(self.beta0))

    def forward(self, lam, phi):
        e, e2 = self.ell.e, self.ell.e2
        q = _q(np.asarray(phi, dtype=np.float64), e, e2)
        beta = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        dl = _wrap_lon(np.asarray(lam, dtype=np.float64) - self.lam0)
        sb0, cb0 = np.sin(self.beta0), np.cos(self.beta0)
        denom = 1.0 + sb0 * np.sin(beta) + cb0 * np.cos(beta) * np.cos(dl)
        B = self.Rq * np.sqrt(2.0 / denom)
        x = self.fe + B * self.D * np.cos(beta) * np.sin(dl)
        y = self.fn + (B / self.D) * (cb0 * np.sin(beta) - sb0 * np.cos(beta) * np.cos(dl))
        return x, y

    def inverse(self, x, y):
        e2 = self.ell.e2
        xp = (np.asarray(x, dtype=np.float64) - self.fe) / self.D
        yp = (np.asarray(y, dtype=np.float64) - self.fn) * self.D
        rho = np.hypot(xp, yp)
        with np.errstate(invalid="ignore"):
            ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        sb0, cb0 = np.sin(self.beta0), np.cos(self.beta0)
        with np.errstate(invalid="ignore", divide="ignore"):
            sbeta = np.where(rho > 0,
                             np.cos(ce) * sb0 + yp * np.sin(ce) * cb0 / np.where(rho > 0, rho, 1.0),
                             sb0)
            beta = np.arcsin(np.clip(sbeta, -1.0, 1.0))
            lam = self.lam0 + np.arctan2(xp * np.sin(ce),
                                         rho * cb0 * np.cos(ce) - yp * sb0 * np.sin(ce))
        return np.where(rho > 0, lam, self.lam0), _phi_from_beta(beta, e2)


class PolarStereographic(_Projection):
    """Snyder 21: ellipsoidal polar stereographic. Variant A (k0 at pole) or
    variant B (lat_ts). `south=True` mirrors through the equator."""

    def __init__(self, ell, lon0=0.0, k0=None, lat_ts=None, fe=0.0, fn=0.0,
                 south=False):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        self.fe, self.fn = fe, fn
        self.south = south
        e, e2 = ell.e, ell.e2
        if lat_ts is not None and abs(abs(lat_ts) - 90.0) > 1e-9:
            pc = abs(lat_ts) * _D2R
            mc = float(_m(np.sin(pc), np.cos(pc), e2))
            tc = float(_t(np.asarray(pc), e))
            self.rho_f = ell.a * mc / tc
        else:
            k0 = 1.0 if k0 is None else k0
            self.rho_f = (2.0 * ell.a * k0
                          / np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)))

    def forward(self, lam, phi):
        e = self.ell.e
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        if self.south:
            lam, phi = -lam, -phi
        t = _t(phi, e)
        rho = self.rho_f * t
        dl = _wrap_lon(lam - (-self.lam0 if self.south else self.lam0))
        x = rho * np.sin(dl)
        y = -rho * np.cos(dl)
        if self.south:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        e2 = self.ell.e2
        xp = np.asarray(x, dtype=np.float64) - self.fe
        yp = np.asarray(y, dtype=np.float64) - self.fn
        if self.south:
            xp, yp = -xp, -yp
        rho = np.hypot(xp, yp)
        t = rho / self.rho_f
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = _phi_from_chi(chi, e2)
        lam0 = -self.lam0 if self.south else self.lam0
        lam = np.where(rho > 0, lam0 + np.arctan2(xp, -yp), lam0)
        if self.south:
            return -lam, -phi
        return lam, phi


class Equirectangular(_Projection):
    """Snyder 12 (plate carree / equidistant cylindrical)."""

    def __init__(self, ell, lon0=0.0, lat_ts=0.0, fe=0.0, fn=0.0):
        self.ell = ell
        self.lam0 = lon0 * _D2R
        self.cosp = float(np.cos(lat_ts * _D2R))
        self.fe, self.fn = fe, fn

    def forward(self, lam, phi):
        a = self.ell.a
        return (self.fe + a * _wrap_lon(np.asarray(lam) - self.lam0) * self.cosp,
                self.fn + a * np.asarray(phi))

    def inverse(self, x, y):
        a = self.ell.a
        return (self.lam0 + (np.asarray(x, dtype=np.float64) - self.fe) / (a * self.cosp),
                (np.asarray(y, dtype=np.float64) - self.fn) / a)


# --- datum shift (EPSG position-vector 7-parameter Helmert) -------------------

@dataclass(frozen=True)
class Helmert:
    """TOWGS84[tx,ty,tz,rx,ry,rz,ds]: translations m, rotations arc-sec,
    scale ppm — the EPSG 9606 position-vector convention (the sign WKT1
    TOWGS84 carries)."""
    tx: float = 0.0
    ty: float = 0.0
    tz: float = 0.0
    rx: float = 0.0
    ry: float = 0.0
    rz: float = 0.0
    ds: float = 0.0

    @property
    def identity(self) -> bool:
        return all(v == 0.0 for v in (self.tx, self.ty, self.tz,
                                      self.rx, self.ry, self.rz, self.ds))

    def _mats(self, invert: bool):
        s = 1.0 + self.ds * 1e-6
        asr = np.pi / (180.0 * 3600.0)
        rx, ry, rz = self.rx * asr, self.ry * asr, self.rz * asr
        R = np.array([[1.0, -rz, ry],
                      [rz, 1.0, -rx],
                      [-ry, rx, 1.0]]) * s
        t = np.array([self.tx, self.ty, self.tz])
        if invert:
            Ri = np.linalg.inv(R)
            return Ri, -Ri @ t
        return R, t

    def apply(self, X, Y, Z, invert=False):
        R, t = self._mats(invert)
        P = np.stack([X, Y, Z])
        Q = R @ P + t[:, None]
        return Q[0], Q[1], Q[2]


def geodetic_to_ecef(lam, phi, ell: Ellipsoid):
    a, e2 = ell.a, ell.e2
    sinp, cosp = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1.0 - e2 * sinp * sinp)
    return N * cosp * np.cos(lam), N * cosp * np.sin(lam), N * (1.0 - e2) * sinp


def ecef_to_geodetic(X, Y, Z, ell: Ellipsoid):
    """Bowring's closed-form initial latitude + one Newton refinement —
    micrometer-exact for |h| < 1000 km, fully vectorized."""
    a, e2 = ell.a, ell.e2
    b = a * np.sqrt(1.0 - e2)
    ep2 = e2 / (1.0 - e2)
    p = np.hypot(X, Y)
    th = np.arctan2(Z * a, p * b)
    phi = np.arctan2(Z + ep2 * b * np.sin(th) ** 3, p - e2 * a * np.cos(th) ** 3)
    for _ in range(2):
        sinp = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * sinp * sinp)
        h = p / np.cos(phi) - N
        phi = np.arctan2(Z, p * (1.0 - e2 * N / (N + h)))
    return np.arctan2(Y, X), phi


# --- CRS ----------------------------------------------------------------------

@dataclass
class CRS:
    """A projection + datum pair with transforms to/from WGS84 lon/lat.

    `unit` scales projected coordinates (1.0 = meter; 0.3048006096012192 =
    US survey foot as State Plane WKT declares)."""
    proj: _Projection
    helmert: Helmert = field(default_factory=Helmert)
    unit: float = 1.0
    name: str = ""

    @property
    def is_geographic(self) -> bool:
        return isinstance(self.proj, Geographic)

    def to_wgs84(self, x, y):
        """Projected (or source-geographic) coords -> WGS84 (lon, lat) deg."""
        x = np.asarray(x, dtype=np.float64) * self.unit
        y = np.asarray(y, dtype=np.float64) * self.unit
        lam, phi = self.proj.inverse(x, y)
        if not self.is_geographic:
            lam = _wrap_lon(np.asarray(lam))   # lam0 offsets can leave (-pi, pi]
        ell = getattr(self.proj, "datum_ell", self.proj.ell)
        if not self.helmert.identity:
            X, Y, Z = geodetic_to_ecef(lam, phi, ell)
            X, Y, Z = self.helmert.apply(X, Y, Z)
            lam, phi = ecef_to_geodetic(X, Y, Z, WGS84)
        return lam * _R2D, phi * _R2D

    def from_wgs84(self, lon, lat):
        """WGS84 (lon, lat) deg -> projected coords (inverse of to_wgs84)."""
        lam = np.asarray(lon, dtype=np.float64) * _D2R
        phi = np.asarray(lat, dtype=np.float64) * _D2R
        ell = getattr(self.proj, "datum_ell", self.proj.ell)
        if not self.helmert.identity:
            X, Y, Z = geodetic_to_ecef(lam, phi, WGS84)
            X, Y, Z = self.helmert.apply(X, Y, Z, invert=True)
            lam, phi = ecef_to_geodetic(X, Y, Z, ell)
        x, y = self.proj.forward(lam, phi)
        return np.asarray(x) / self.unit, np.asarray(y) / self.unit


# --- EPSG registry ------------------------------------------------------------

def crs_from_epsg(code: int) -> CRS:
    """Common EPSG codes, generated from their published definitions.
    UTM zones are computed (central meridian = 6*zone - 183)."""
    if code in (4326, 4258, 4269, 4171):      # WGS84 / ETRS89 / NAD83 / RGF93
        return CRS(Geographic(WGS84), name=f"EPSG:{code}")
    if code in (3857, 900913, 102100, 102113, 3785):
        return CRS(WebMercator(), name="EPSG:3857")
    if 32601 <= code <= 32660:                # WGS84 UTM north
        z = code - 32600
        return CRS(TransverseMercator(WGS84, lon0=6 * z - 183, k0=0.9996,
                                      fe=500000.0), name=f"EPSG:{code}")
    if 32701 <= code <= 32760:                # WGS84 UTM south
        z = code - 32700
        return CRS(TransverseMercator(WGS84, lon0=6 * z - 183, k0=0.9996,
                                      fe=500000.0, fn=10000000.0), name=f"EPSG:{code}")
    if 25828 <= code <= 25838:                # ETRS89 UTM
        z = code - 25800
        return CRS(TransverseMercator(GRS80, lon0=6 * z - 183, k0=0.9996,
                                      fe=500000.0), name=f"EPSG:{code}")
    if 26901 <= code <= 26923:                # NAD83 UTM
        z = code - 26900
        return CRS(TransverseMercator(GRS80, lon0=6 * z - 183, k0=0.9996,
                                      fe=500000.0), name=f"EPSG:{code}")
    if code == 2154:                          # RGF93 / Lambert-93
        return CRS(LambertConformalConic(GRS80, lon0=3.0, lat0=46.5, sp1=49.0,
                                         sp2=44.0, fe=700000.0, fn=6600000.0),
                   name="EPSG:2154")
    if code == 27700:                         # OSGB36 / British National Grid
        return CRS(TransverseMercator(_ELLIPSOIDS["Airy 1830"], lon0=-2.0,
                                      lat0=49.0, k0=0.9996012717,
                                      fe=400000.0, fn=-100000.0),
                   helmert=Helmert(446.448, -125.157, 542.060,
                                   0.1502, 0.2470, 0.8421, -20.4894),
                   name="EPSG:27700")
    if code == 3035:                          # ETRS89-extended / LAEA Europe
        return CRS(LambertAzimuthalEqualArea(GRS80, lon0=10.0, lat0=52.0,
                                             fe=4321000.0, fn=3210000.0),
                   name="EPSG:3035")
    if code == 5070:                          # NAD83 / Conus Albers
        return CRS(AlbersEqualArea(GRS80, lon0=-96.0, lat0=23.0,
                                   sp1=29.5, sp2=45.5), name="EPSG:5070")
    if code == 3413:                          # NSIDC polar stereo north
        return CRS(PolarStereographic(WGS84, lon0=-45.0, lat_ts=70.0),
                   name="EPSG:3413")
    if code == 3031:                          # Antarctic polar stereo
        return CRS(PolarStereographic(WGS84, lon0=0.0, lat_ts=71.0, south=True),
                   name="EPSG:3031")
    if code == 4087:                          # world equidistant cylindrical
        return CRS(Equirectangular(WGS84), name="EPSG:4087")
    raise ValueError(f"EPSG:{code} not in the built-in registry; "
                     f"pass the CRS as WKT instead")


# --- WKT1 (.prj) parser -------------------------------------------------------

_TOKEN = re.compile(r'"((?:[^"]|"")*)"|([A-Za-z_][A-Za-z0-9_]*)|([-+0-9.eE]+)|([\[\],()])')


def _parse_wkt(text: str):
    """WKT1 -> nested [keyword, arg, ...] lists (brackets or parens)."""
    pos = 0
    n = len(text)

    def node():
        nonlocal pos
        m = _TOKEN.match(text, pos)
        while m and text[m.start():m.end()].isspace():
            pos = m.end()
            m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"WKT parse error at {pos}: {text[pos:pos+30]!r}")
        pos = m.end()
        if m.group(1) is not None:
            return m.group(1).replace('""', '"')
        if m.group(3) is not None:
            return float(m.group(3))
        if m.group(4) is not None:
            raise ValueError(f"unexpected {m.group(4)!r} at {m.start()}")
        kw = m.group(2)
        while pos < n and text[pos].isspace():
            pos += 1
        if pos < n and text[pos] in "[(":
            close = "]" if text[pos] == "[" else ")"
            pos += 1
            items = [kw.upper()]
            while True:
                while pos < n and text[pos] in ", \t\r\n":
                    pos += 1
                if pos < n and text[pos] == close:
                    pos += 1
                    return items
                items.append(node())
        return kw

    return node()


def _wkt_find(tree, keyword):
    if isinstance(tree, list):
        if tree and tree[0] == keyword:
            return tree
        for item in tree[1:]:
            found = _wkt_find(item, keyword)
            if found is not None:
                return found
    return None


def _wkt_params(tree) -> dict:
    out = {}
    if isinstance(tree, list):
        if tree and tree[0] == "PARAMETER" and len(tree) >= 3:
            out[str(tree[1]).lower()] = float(tree[2])
        for item in tree[1:]:
            out.update(_wkt_params(item))
    return out


def _param(params, *names, default=None):
    for nm in names:
        if nm in params:
            return params[nm]
    if default is None:
        raise ValueError(f"missing projection parameter {names[0]}")
    return default


def crs_from_wkt(text: str) -> CRS:
    """WKT1 PROJCS/GEOGCS (the .prj dialect ESRI writes) -> CRS."""
    tree = _parse_wkt(text)
    sph = _wkt_find(tree, "SPHEROID") or _wkt_find(tree, "ELLIPSOID")
    if sph is None:
        raise ValueError("WKT has no SPHEROID")
    ell = Ellipsoid(float(sph[2]), float(sph[3]))
    tw = _wkt_find(tree, "TOWGS84")
    helm = Helmert(*[float(v) for v in tw[1:8]]) if tw and len(tw) >= 4 else Helmert()
    name = str(tree[1]) if isinstance(tree, list) and len(tree) > 1 else ""

    if tree[0] == "GEOGCS" or _wkt_find(tree, "PROJECTION") is None:
        return CRS(Geographic(ell), helmert=helm, name=name)

    projname = str(_wkt_find(tree, "PROJECTION")[1]).lower()
    params = _wkt_params(tree)
    # the PROJCS-level UNIT (the last one lexically is projected-units;
    # GEOGCS's is degrees) — find the one NOT inside GEOGCS
    unit = 1.0
    projcs = _wkt_find(tree, "PROJCS")
    if projcs:
        for item in projcs[1:]:
            if isinstance(item, list) and item[0] == "UNIT":
                unit = float(item[2])

    fe = _param(params, "false_easting", default=0.0) * unit
    fn = _param(params, "false_northing", default=0.0) * unit
    lon0 = _param(params, "central_meridian", "longitude_of_center",
                  "longitude_of_origin", default=0.0)
    lat0 = _param(params, "latitude_of_origin", "latitude_of_center", default=0.0)

    if "transverse_mercator" in projname or "gauss" in projname:
        proj = TransverseMercator(ell, lon0=lon0, lat0=lat0,
                                  k0=_param(params, "scale_factor", default=1.0),
                                  fe=fe, fn=fn)
    elif "lambert_conformal_conic" in projname:
        sp1 = _param(params, "standard_parallel_1", default=lat0)
        sp2 = _param(params, "standard_parallel_2", default=sp1)
        proj = LambertConformalConic(ell, lon0=lon0, lat0=lat0, sp1=sp1, sp2=sp2,
                                     k0=_param(params, "scale_factor", default=1.0),
                                     fe=fe, fn=fn)
    elif "albers" in projname:
        proj = AlbersEqualArea(ell, lon0=lon0, lat0=lat0,
                               sp1=_param(params, "standard_parallel_1"),
                               sp2=_param(params, "standard_parallel_2"),
                               fe=fe, fn=fn)
    elif "lambert_azimuthal" in projname:
        proj = LambertAzimuthalEqualArea(ell, lon0=lon0, lat0=lat0, fe=fe, fn=fn)
    elif "stereographic_south_pole" in projname:
        proj = PolarStereographic(ell, lon0=lon0,
                                  lat_ts=_param(params, "standard_parallel_1", default=-90.0),
                                  fe=fe, fn=fn, south=True)
    elif "stereographic_north_pole" in projname or "polar_stereographic" in projname:
        ts = _param(params, "standard_parallel_1", "latitude_of_standard_parallel",
                    default=90.0)
        proj = PolarStereographic(ell, lon0=lon0, lat_ts=abs(ts),
                                  k0=_param(params, "scale_factor", default=1.0),
                                  fe=fe, fn=fn, south=ts < 0)
    elif "mercator_auxiliary_sphere" in projname or "pseudo" in projname:
        proj = WebMercator()
    elif "mercator" in projname:
        sp1 = params.get("standard_parallel_1")
        proj = Mercator(ell, lon0=lon0,
                        k0=_param(params, "scale_factor", default=1.0),
                        lat_ts=sp1, fe=fe, fn=fn)
    elif "equirectangular" in projname or "plate_carree" in projname:
        proj = Equirectangular(ell, lon0=lon0,
                               lat_ts=_param(params, "standard_parallel_1", default=lat0),
                               fe=fe, fn=fn)
    else:
        raise ValueError(f"unsupported WKT projection {projname!r}")
    # FE/FN were converted to meters above; CRS.unit converts incoming x/y
    # (possibly feet) to meters before the inverse projection
    return CRS(proj, helmert=helm, unit=unit, name=name)


def decode_crs(spec: str) -> CRS:
    """GeoUtils.decodeCRS:768-791 analog: `EPSG:n` / `n` / WKT text."""
    s = spec.strip()
    m = re.fullmatch(r"(?i)(?:epsg|esri)\s*:\s*(\d+)", s)
    if m:
        return crs_from_epsg(int(m.group(1)))
    if re.fullmatch(r"\d+", s):
        return crs_from_epsg(int(s))
    return crs_from_wkt(s)
