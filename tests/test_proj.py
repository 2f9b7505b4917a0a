"""CRS transform kernel (kernels/proj.py) — published worked examples,
differential conformality/equal-area properties, round-trips, WKT parsing,
and the shapefile reprojection hook (ShapefileReader.java:65-78 parity)."""

import struct

import numpy as np
import pytest

from planetiler_spark.kernels import proj as P

CLARKE66 = P.Ellipsoid(6378206.4, 294.978698214)
rng = np.random.default_rng(7)


def _merid_dist(ell, phi0, phi1, steps=20001):
    """Numeric ellipsoidal meridian arc length (for scale-factor checks)."""
    p = np.linspace(phi0, phi1, steps)
    M = ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(p) ** 2) ** 1.5
    return np.trapezoid(M, p) if hasattr(np, "trapezoid") else np.trapz(M, p)


# --- published worked examples ------------------------------------------------

def test_snyder_lcc_2sp_worked_example():
    # Snyder PP1395 p.296: Clarke 1866, sp 33/45, origin (23N, 96W),
    # point (35N, 75W) -> x=1,894,410.9  y=1,564,649.5 (meters)
    lcc = P.LambertConformalConic(CLARKE66, lon0=-96.0, lat0=23.0,
                                  sp1=33.0, sp2=45.0)
    x, y = lcc.forward(np.array([-75.0]) * np.pi / 180,
                       np.array([35.0]) * np.pi / 180)
    assert abs(x[0] - 1894410.9) < 0.5
    assert abs(y[0] - 1564649.5) < 0.5
    lam, phi = lcc.inverse(x, y)
    assert abs(np.degrees(lam[0]) - (-75.0)) < 1e-9
    assert abs(np.degrees(phi[0]) - 35.0) < 1e-9


def test_snyder_albers_worked_example():
    # Snyder PP1395 p.292: Clarke 1866, sp 29.5/45.5, origin (23N, 96W),
    # point (35N, 75W) -> x=1,885,472.7  y=1,535,925.0 (meters)
    alb = P.AlbersEqualArea(CLARKE66, lon0=-96.0, lat0=23.0,
                            sp1=29.5, sp2=45.5)
    x, y = alb.forward(np.array([-75.0]) * np.pi / 180,
                       np.array([35.0]) * np.pi / 180)
    assert abs(x[0] - 1885472.7) < 0.5
    assert abs(y[0] - 1535925.0) < 0.5


def test_osgb_worked_example():
    # Ordnance Survey "A guide to coordinate systems in Great Britain",
    # worked example: OSGB36 lat 52deg39'27.2531"N lon 1deg43'4.5177"E
    # -> E 651409.903  N 313177.270 (projection only, no datum shift)
    crs = P.crs_from_epsg(27700)
    phi = (52 + 39 / 60 + 27.2531 / 3600) * np.pi / 180
    lam = (1 + 43 / 60 + 4.5177 / 3600) * np.pi / 180
    x, y = crs.proj.forward(np.array([lam]), np.array([phi]))
    assert abs(x[0] - 651409.903) < 0.01
    assert abs(y[0] - 313177.270) < 0.01


# --- construction anchors (exact by definition) -------------------------------

def test_origin_anchors():
    for code, lon, lat, ex, ey in [
        (32633, 15.0, 0.0, 500000.0, 0.0),          # UTM 33N CM at equator
        (32733, 15.0, 0.0, 500000.0, 10000000.0),   # UTM 33S
        (2154, 3.0, 46.5, 700000.0, 6600000.0),     # Lambert-93 origin
        (3035, 10.0, 52.0, 4321000.0, 3210000.0),   # LAEA Europe origin
        (5070, -96.0, 23.0, 0.0, 0.0),              # Conus Albers origin
        (3413, 0.0, 90.0, 0.0, 0.0),                # polar stereo N pole
        (3031, 0.0, -90.0, 0.0, 0.0),               # polar stereo S pole
    ]:
        crs = P.crs_from_epsg(code)
        x, y = crs.from_wgs84(np.array([lon]), np.array([lat]))
        assert abs(x[0] - ex) < 1e-6 and abs(y[0] - ey) < 1e-6, (code, x, y)


def test_utm_scale_factor_on_central_meridian():
    # ellipsoidal distance along the CM must map at exactly k0=0.9996
    crs = P.crs_from_epsg(32633)
    p0, p1 = np.radians(40.0), np.radians(40.1)
    (x0, y0) = crs.proj.forward(np.array([np.radians(15.0)]), np.array([p0]))
    (x1, y1) = crs.proj.forward(np.array([np.radians(15.0)]), np.array([p1]))
    ratio = (y1[0] - y0[0]) / _merid_dist(P.WGS84, p0, p1)
    assert abs(ratio - 0.9996) < 1e-9


def test_lcc_scale_unity_at_standard_parallels():
    crs = P.crs_from_epsg(2154)   # sp 44 / 49
    for sp in (44.0, 49.0):
        lam = np.radians(np.array([3.0, 3.0 + 1e-5]))
        phi = np.radians(np.array([sp, sp]))
        x, y = crs.proj.forward(lam, phi)
        ground = (P.WGS84.a * np.cos(phi[0]) / np.sqrt(1 - P.WGS84.e2 * np.sin(phi[0]) ** 2)
                  * (lam[1] - lam[0]))
        # GRS80 vs WGS84 differ at 1e-9 level; irrelevant here
        assert abs(np.hypot(x[1] - x[0], y[1] - y[0]) / ground - 1.0) < 1e-6


# --- differential properties --------------------------------------------------

def _jacobian(proj, lam, phi, d=1e-7):
    x0, y0 = proj.forward(lam, phi)
    xl, yl = proj.forward(lam + d, phi)
    xp, yp = proj.forward(lam, phi + d)
    return ((np.asarray(xl) - np.asarray(x0)) / d, (np.asarray(yl) - np.asarray(y0)) / d,
            (np.asarray(xp) - np.asarray(x0)) / d, (np.asarray(yp) - np.asarray(y0)) / d)


def _ground_scales(ell, phi):
    sinp = np.sin(phi)
    W = np.sqrt(1 - ell.e2 * sinp * sinp)
    M = ell.a * (1 - ell.e2) / W ** 3          # meridian radius
    Npar = ell.a * np.cos(phi) / W             # parallel radius (N cos phi)
    return M, Npar


@pytest.mark.parametrize("make,lons,lats", [
    (lambda: P.TransverseMercator(P.WGS84, lon0=15, k0=0.9996, fe=5e5), (10, 20), (-60, 70)),
    (lambda: P.LambertConformalConic(P.GRS80, 3, 46.5, 49, 44, fe=7e5, fn=66e5), (-4, 9), (41, 51)),
    (lambda: P.Mercator(P.WGS84, lon0=0, k0=1.0), (-170, 170), (-75, 75)),
    (lambda: P.PolarStereographic(P.WGS84, lon0=-45, lat_ts=70), (-180, 179), (55, 89)),
])
def test_conformal_projections_are_locally_isotropic(make, lons, lats):
    proj = make()
    lam = np.radians(rng.uniform(*lons, 50))
    phi = np.radians(rng.uniform(*lats, 50))
    dxl, dyl, dxp, dyp = _jacobian(proj, lam, phi)
    M, Npar = _ground_scales(proj.ell, phi)
    h = np.hypot(dxp, dyp) / M                 # meridian scale
    k = np.hypot(dxl, dyl) / Npar              # parallel scale
    assert np.allclose(h, k, rtol=1e-5)
    # orthogonal image axes
    dot = dxl * dxp + dyl * dyp
    assert np.all(np.abs(dot) / (np.hypot(dxl, dyl) * np.hypot(dxp, dyp)) < 1e-5)


@pytest.mark.parametrize("make,lons,lats", [
    (lambda: P.AlbersEqualArea(P.GRS80, -96, 23, 29.5, 45.5), (-120, -70), (25, 50)),
    (lambda: P.LambertAzimuthalEqualArea(P.GRS80, 10, 52, fe=4321e3, fn=3210e3), (-10, 30), (35, 68)),
])
def test_equal_area_projections_preserve_area(make, lons, lats):
    proj = make()
    lam = np.radians(rng.uniform(*lons, 50))
    phi = np.radians(rng.uniform(*lats, 50))
    dxl, dyl, dxp, dyp = _jacobian(proj, lam, phi)
    jac = np.abs(dxl * dyp - dxp * dyl)
    M, Npar = _ground_scales(proj.ell, phi)
    assert np.allclose(jac, M * Npar, rtol=1e-5)


def test_tm_sphere_matches_closed_form():
    # with e=0 the Krueger series truncates to the exact spherical TM
    # (Snyder 8-1/8-3): x = a atanh(cos phi sin lam'), y = a atan(tan phi / cos lam')
    sph = P.Ellipsoid(6371000.0, 0.0)
    tm = P.TransverseMercator(sph, lon0=0.0, k0=1.0)
    lam = np.radians(rng.uniform(-30, 30, 200))
    phi = np.radians(rng.uniform(-80, 80, 200))
    x, y = tm.forward(lam, phi)
    B = np.cos(phi) * np.sin(lam)
    assert np.allclose(x, 6371000.0 * np.arctanh(B), atol=1e-6)
    assert np.allclose(y, 6371000.0 * np.arctan2(np.tan(phi), np.cos(lam)), atol=1e-6)


def test_web_mercator_matches_format_module():
    from planetiler_spark.functions import format as fm
    crs = P.crs_from_epsg(3857)
    lon = rng.uniform(-179, 179, 100)
    lat = rng.uniform(-85, 85, 100)
    x, y = crs.from_wgs84(lon, lat)
    fx, fy = fm.lonlat_to_mercator(lon, lat)
    assert np.allclose(x, fx, atol=1e-6) and np.allclose(y, fy, atol=1e-6)
    lo, la = crs.to_wgs84(x, y)
    assert np.allclose(lo, lon, atol=1e-12) and np.allclose(la, lat, atol=1e-12)


# --- round-trips over every registry entry ------------------------------------

@pytest.mark.parametrize("code,lons,lats", [
    (32633, (9, 21), (-80, 84)), (32719, (-75, -63), (-80, 0)),
    (25832, (6, 12), (35, 72)), (26917, (-84, -78), (24, 84)),
    (2154, (-5, 10), (41, 51)), (27700, (-8, 2), (49.8, 60.9)),
    (3035, (-10, 35), (32, 72)), (5070, (-125, -65), (22, 50)),
    (3413, (-180, 179), (60, 89.5)), (3031, (-180, 179), (-89.5, -60)),
    (4087, (-179, 179), (-85, 85)), (4326, (-179, 179), (-89, 89)),
])
def test_roundtrip_registry(code, lons, lats):
    crs = P.crs_from_epsg(code)
    lon = rng.uniform(*lons, 300)
    lat = rng.uniform(*lats, 300)
    x, y = crs.from_wgs84(lon, lat)
    lo, la = crs.to_wgs84(x, y)
    # 1e-9 deg ~ 0.1 um ground distance
    assert np.allclose(lo, lon, atol=1e-9), code
    assert np.allclose(la, lat, atol=1e-9), code


# --- datum shift ---------------------------------------------------------------

def test_ecef_roundtrip():
    lam = np.radians(rng.uniform(-180, 180, 500))
    phi = np.radians(rng.uniform(-89.9, 89.9, 500))
    X, Y, Z = P.geodetic_to_ecef(lam, phi, P.WGS84)
    lam2, phi2 = P.ecef_to_geodetic(X, Y, Z, P.WGS84)
    assert np.allclose(np.unwrap([lam, lam2], axis=0)[1], lam, atol=1e-12)
    assert np.allclose(phi2, phi, atol=1e-12)


def test_helmert_greenwich_shift():
    # the Airy transit circle (OSGB36 lon 0) sits ~102 m EAST of the WGS84
    # prime meridian: to_wgs84 of Greenwich observatory grid coords
    # (E 538894, N 177336) must give a small NEGATIVE longitude
    crs = P.crs_from_epsg(27700)
    lon, lat = crs.to_wgs84(np.array([538894.0]), np.array([177336.0]))
    assert -0.003 < lon[0] < -0.0005
    assert 51.46 < lat[0] < 51.49


def test_helmert_inverse_is_exact_roundtrip():
    crs = P.crs_from_epsg(27700)
    lon = rng.uniform(-6, 1.5, 200)
    lat = rng.uniform(50, 58, 200)
    x, y = crs.from_wgs84(lon, lat)
    lo, la = crs.to_wgs84(x, y)
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, lat, atol=1e-9)


# --- WKT parsing ---------------------------------------------------------------

_WKT_UTM33 = ('PROJCS["WGS_1984_UTM_Zone_33N",GEOGCS["GCS_WGS_1984",'
              'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
              'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
              'PROJECTION["Transverse_Mercator"],'
              'PARAMETER["False_Easting",500000.0],'
              'PARAMETER["False_Northing",0.0],'
              'PARAMETER["Central_Meridian",15.0],'
              'PARAMETER["Scale_Factor",0.9996],'
              'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]')

_WKT_SP_FEET = ('PROJCS["NAD_1983_StatePlane_Texas_Central_FIPS_4203_Feet",'
                'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
                'SPHEROID["GRS_1980",6378137.0,298.257222101]],'
                'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
                'PROJECTION["Lambert_Conformal_Conic"],'
                'PARAMETER["False_Easting",2296583.333333333],'
                'PARAMETER["False_Northing",9842500.0],'
                'PARAMETER["Central_Meridian",-100.333333333333],'
                'PARAMETER["Standard_Parallel_1",30.1166666666667],'
                'PARAMETER["Standard_Parallel_2",31.8833333333333],'
                'PARAMETER["Latitude_Of_Origin",29.6666666666667],'
                'UNIT["Foot_US",0.304800609601219]]')


def test_wkt_utm_matches_epsg_registry():
    wk = P.crs_from_wkt(_WKT_UTM33)
    ep = P.crs_from_epsg(32633)
    lon = rng.uniform(10, 20, 100)
    lat = rng.uniform(-70, 70, 100)
    xw, yw = wk.from_wgs84(lon, lat)
    xe, ye = ep.from_wgs84(lon, lat)
    assert np.allclose(xw, xe, atol=1e-9) and np.allclose(yw, ye, atol=1e-9)


def test_wkt_feet_unit_scaling():
    crs_ft = P.crs_from_wkt(_WKT_SP_FEET)
    crs_m = P.crs_from_wkt(_WKT_SP_FEET.replace(
        'UNIT["Foot_US",0.304800609601219]]', 'UNIT["Meter",1.0]]')
        .replace('2296583.333333333', str(2296583.333333333 * 0.304800609601219))
        .replace('9842500.0', str(9842500.0 * 0.304800609601219)))
    lon, lat = np.array([-97.7]), np.array([30.3])
    x_ft, y_ft = crs_ft.from_wgs84(lon, lat)
    x_m, y_m = crs_m.from_wgs84(lon, lat)
    assert abs(x_ft[0] * 0.304800609601219 - x_m[0]) < 1e-6
    assert abs(y_ft[0] * 0.304800609601219 - y_m[0]) < 1e-6
    lo, la = crs_ft.to_wgs84(x_ft, y_ft)
    assert abs(lo[0] - lon[0]) < 1e-9 and abs(la[0] - lat[0]) < 1e-9


def test_wkt_geographic_and_decode_spec():
    geo = P.crs_from_wkt('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                         'SPHEROID["WGS_1984",6378137,298.257223563]],'
                         'PRIMEM["Greenwich",0],UNIT["Degree",0.017453292519943295]]')
    assert geo.is_geographic and geo.helmert.identity
    lon, lat = geo.to_wgs84(np.array([12.5]), np.array([-33.25]))
    assert lon[0] == 12.5 and lat[0] == -33.25
    assert P.decode_crs("EPSG:3857").name == "EPSG:3857"
    assert P.decode_crs("32633").name == "EPSG:32633"
    with pytest.raises(ValueError):
        P.crs_from_epsg(99999)


def test_wkt_towgs84_parsed():
    wkt = ('PROJCS["OSGB",GEOGCS["GCS_OSGB_1936",DATUM["D_OSGB_1936",'
           'SPHEROID["Airy_1830",6377563.396,299.3249646],'
           'TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],'
           'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["False_Easting",400000],PARAMETER["False_Northing",-100000],'
           'PARAMETER["Central_Meridian",-2],PARAMETER["Scale_Factor",0.9996012717],'
           'PARAMETER["Latitude_Of_Origin",49],UNIT["Meter",1]]')
    wk = P.crs_from_wkt(wkt)
    ep = P.crs_from_epsg(27700)
    lon = rng.uniform(-6, 1.5, 50)
    lat = rng.uniform(50, 58, 50)
    xw, yw = wk.from_wgs84(lon, lat)
    xe, ye = ep.from_wgs84(lon, lat)
    assert np.allclose(xw, xe, atol=1e-6) and np.allclose(yw, ye, atol=1e-6)


# --- shapefile reprojection hook ----------------------------------------------

def _write_point_shapefile(base, pts_xy, prj_wkt):
    """Minimal single-field point shapefile (enough for read_shapefile)."""
    n = len(pts_xy)
    recs = b""
    offsets = []
    pos = 100
    for i, (x, y) in enumerate(pts_xy):
        content = struct.pack("<idd", 1, x, y)
        recs += struct.pack(">ii", i + 1, len(content) // 2) + content
        offsets.append((pos // 2, len(content) // 2))
        pos += 8 + len(content)
    xs = [p[0] for p in pts_xy]
    ys = [p[1] for p in pts_xy]
    header = struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, (100 + len(recs)) // 2)
    header += struct.pack("<ii", 1000, 1)
    header += struct.pack("<8d", min(xs), min(ys), max(xs), max(ys), 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f:
        f.write(header + recs)
    shx_body = b"".join(struct.pack(">ii", off, ln) for off, ln in offsets)
    shx_header = struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, (100 + len(shx_body)) // 2)
    shx_header += struct.pack("<ii", 1000, 1)
    shx_header += struct.pack("<8d", min(xs), min(ys), max(xs), max(ys), 0, 0, 0, 0)
    with open(base + ".shx", "wb") as f:
        f.write(shx_header + shx_body)
    # dbf: one C field "name", records "p0".."pN"
    field = b"name".ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([8]) + b"\x00" * 15
    hdr = struct.pack("<B3xI HH 20x", 3, n, 32 + 32 + 1, 1 + 8)
    with open(base + ".dbf", "wb") as f:
        f.write(hdr + field + b"\x0d"
                + b"".join(b" " + f"p{i}".encode().ljust(8) for i in range(n)))
    with open(base + ".prj", "w") as f:
        f.write(prj_wkt)


def test_shapefile_utm_reprojected_to_wgs84(spark, tmp_path):
    import planetiler_spark.sources.vector_formats as vf
    crs = P.crs_from_epsg(32633)
    lons = np.array([12.4924, 14.2681, 16.3738])   # Rome, ~Malta, Vienna lons
    lats = np.array([41.8902, 35.8997, 48.2082])
    xs, ys = crs.from_wgs84(lons, lats)
    base = str(tmp_path / "utmpts")
    _write_point_shapefile(base, list(zip(xs, ys)), _WKT_UTM33)
    rows = sorted(vf.read_shapefile(spark, base + ".shp").collect(),
                  key=lambda r: r.id)
    assert len(rows) == 3
    got = np.array([(r.minx, r.miny) for r in rows])
    assert np.allclose(got[:, 0], lons, atol=1e-8)
    assert np.allclose(got[:, 1], lats, atol=1e-8)
    assert rows[0].tags["name"] == "p0"
    # explicit source_projection overrides the .prj (reference's
    # --shapefile-projection flag): claiming 32632 shifts longitudes by ~6 deg
    rows2 = vf.read_shapefile(spark, base + ".shp",
                              source_projection="EPSG:32632").collect()
    assert abs(sorted(r.minx for r in rows2)[0] - (lons[0] - 6.0)) < 0.1


def _write_utm_gpkg(path, pts_lonlat):
    """Minimal GeoPackage: one point table in EPSG:32633."""
    import sqlite3
    from planetiler_spark.kernels import geom as gk
    crs = P.crs_from_epsg(32633)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    con.execute("CREATE TABLE gpkg_geometry_columns "
                "(table_name TEXT, column_name TEXT, srs_id INTEGER)")
    con.execute("CREATE TABLE gpkg_spatial_ref_sys (srs_id INTEGER, "
                "organization TEXT, organization_coordsys_id INTEGER, definition TEXT)")
    con.execute("CREATE TABLE pts (fid INTEGER PRIMARY KEY, name TEXT, geom BLOB)")
    con.execute("INSERT INTO gpkg_contents VALUES ('pts', 'features')")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('pts', 'geom', 32633)")
    con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES (32633, 'EPSG', 32633, '')")
    for i, (lon, lat) in enumerate(pts_lonlat):
        x, y = crs.from_wgs84(np.array([lon]), np.array([lat]))
        gp = b"GP\x00\x01" + struct.pack("<i", 32633) + gk.wkb_point(float(x[0]), float(y[0]))
        con.execute("INSERT INTO pts VALUES (?, ?, ?)", (i + 1, f"n{i}", gp))
    con.commit()
    con.close()


def test_geopackage_utm_reprojected_to_wgs84(spark, tmp_path):
    import planetiler_spark.sources.vector_formats as vf
    path = str(tmp_path / "utm.gpkg")
    lons, lats = [12.4924, 16.3738], [41.8902, 48.2082]
    _write_utm_gpkg(path, list(zip(lons, lats)))
    rows = sorted(vf.read_geopackage(spark, path).collect(), key=lambda r: r.id)
    assert len(rows) == 2
    assert np.allclose([r.minx for r in rows], lons, atol=1e-8)
    assert np.allclose([r.miny for r in rows], lats, atol=1e-8)
    assert rows[0].tags["name"] == "n0"
    # geometry WKB is rewritten in lon/lat too, not just the bbox
    from planetiler_spark.kernels import geom as gk
    typ, (px, py) = gk.parse_wkb(bytes(rows[1].geom_wkb))
    assert typ == "point" and abs(px - lons[1]) < 1e-8 and abs(py - lats[1]) < 1e-8


def test_shapefile_geographic_prj_passthrough(spark, tmp_path):
    import planetiler_spark.sources.vector_formats as vf
    base = str(tmp_path / "geopts")
    _write_point_shapefile(base, [(12.5, 41.9), (2.35, 48.86)],
                           'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                           'SPHEROID["WGS_1984",6378137,298.257223563]],'
                           'PRIMEM["Greenwich",0],UNIT["Degree",0.017453292519943295]]')
    rows = sorted(vf.read_shapefile(spark, base + ".shp").collect(),
                  key=lambda r: r.id)
    assert (rows[0].minx, rows[0].miny) == (12.5, 41.9)
    assert (rows[1].minx, rows[1].miny) == (2.35, 48.86)
