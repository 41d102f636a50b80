"""Golden-value tests for the geometry layer (vs scipy and known constants)."""
import numpy as np
from scipy.spatial.transform import Rotation

from gisnav_tpu.geometry import (
    BBox,
    affine_to_proj,
    angle_off_nadir,
    bbox_overlap_fraction,
    compose,
    ecef_to_wgs84,
    enu_offset_to_wgs84,
    enu_to_ecef_matrix,
    euler_to_quat,
    fov_bounding_box_enu,
    haversine_m,
    heading_deg_from_quat,
    invert,
    make_transform,
    matrix_to_quat,
    pixel_to_wgs84_affine,
    poses_to_twist,
    proj_to_affine,
    project_fov_to_ground,
    quat_mul,
    quat_rotate,
    quat_slerp,
    quat_to_euler,
    quat_to_matrix,
    roll_deg_from_quat,
    square_and_pad,
    utm_to_wgs84,
    utm_zone,
    wgs84_to_ecef,
    wgs84_to_utm,
)


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


class TestQuaternion:
    def test_mul_matches_scipy(self, rng):
        for _ in range(20):
            q1, q2 = _rand_quat(rng), _rand_quat(rng)
            got = quat_mul(q1, q2)
            want = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
            assert np.allclose(got, want) or np.allclose(got, -want)

    def test_rotate_matches_scipy(self, rng):
        for _ in range(20):
            q, v = _rand_quat(rng), rng.normal(size=3)
            assert np.allclose(quat_rotate(q, v), Rotation.from_quat(q).apply(v))

    def test_matrix_roundtrip(self, rng):
        for _ in range(20):
            q = _rand_quat(rng)
            m = quat_to_matrix(q)
            assert np.allclose(m, Rotation.from_quat(q).as_matrix())
            q2 = matrix_to_quat(m)
            assert np.allclose(q2, q) or np.allclose(q2, -q)

    def test_euler_roundtrip(self):
        q = euler_to_quat(0.1, -0.4, 2.0)
        want = Rotation.from_euler("xyz", [0.1, -0.4, 2.0]).as_quat()
        assert np.allclose(q, want) or np.allclose(q, -want)
        r, p, y = quat_to_euler(q)
        assert np.allclose([r, p, y], [0.1, -0.4, 2.0])

    def test_heading_north_origin(self):
        # ENU yaw 0 (facing east) => compass heading 90 deg
        q = euler_to_quat(0, 0, 0.0)
        assert np.isclose(heading_deg_from_quat(q), 90.0)
        # ENU yaw 90 deg (facing north) => heading 0
        q = euler_to_quat(0, 0, np.pi / 2)
        assert np.isclose(heading_deg_from_quat(q) % 360, 0.0)

    def test_roll_normalized(self):
        q = euler_to_quat(-0.1, 0, 0)
        assert np.isclose(roll_deg_from_quat(q), 360.0 - np.degrees(0.1))

    def test_angle_off_nadir(self):
        # Camera forward +x rotated to point straight down: pitch -90 deg
        q = euler_to_quat(0, np.pi / 2, 0)  # +x maps to -z
        assert np.isclose(angle_off_nadir(q), 0.0, atol=1e-9)
        q = euler_to_quat(0, 0, 0)  # +x horizontal
        assert np.isclose(angle_off_nadir(q), np.pi / 2)

    def test_slerp_endpoints_and_midpoint(self, rng):
        q0, q1 = _rand_quat(rng), _rand_quat(rng)
        assert np.allclose(quat_slerp(q0, q1, 0.0), q0) or np.allclose(
            quat_slerp(q0, q1, 0.0), -q0
        )
        mid = quat_slerp(q0, q1, 0.5)
        want = (
            Rotation.from_quat([q0, q1])
        )
        # midpoint is unit-norm and equidistant
        assert np.isclose(np.linalg.norm(mid), 1.0)
        d0 = np.abs(np.dot(mid, q0 / np.linalg.norm(q0)))
        d1 = np.abs(np.dot(mid, q1 / np.linalg.norm(q1)))
        assert np.isclose(d0, d1, atol=1e-9)


class TestSE3:
    def test_invert_compose(self, rng):
        r = Rotation.random(random_state=1).as_matrix()
        t = rng.normal(size=3)
        h = make_transform(r, t)
        assert np.allclose(compose(h, invert(h)), np.eye(4), atol=1e-12)

    def test_poses_to_twist(self):
        lin, ang = poses_to_twist(
            pos2=np.array([1.0, 2.0, 3.0]),
            quat2=euler_to_quat(0, 0, np.pi / 2),
            stamp2_us=2_000_000,
            pos1=np.zeros(3),
            quat1=euler_to_quat(0, 0, 0),
            stamp1_us=1_000_000,
        )
        assert np.allclose(lin, [1.0, 2.0, 3.0])
        assert np.allclose(ang, [0, 0, np.pi / 2])


class TestCRS:
    def test_ecef_known_points(self):
        x, y, z = wgs84_to_ecef(0.0, 0.0, 0.0)
        assert np.allclose([x, y, z], [6378137.0, 0.0, 0.0])
        x, y, z = wgs84_to_ecef(90.0, 0.0, 0.0)
        assert np.allclose([x, y, z], [0.0, 6378137.0, 0.0], atol=1e-6)
        x, y, z = wgs84_to_ecef(0.0, 90.0, 0.0)
        # polar radius
        assert np.allclose([x, y, z], [0.0, 0.0, 6356752.314245], atol=1e-5)

    def test_ecef_roundtrip(self, rng):
        for _ in range(50):
            lon = rng.uniform(-180, 180)
            lat = rng.uniform(-89.9, 89.9)
            alt = rng.uniform(-100, 10000)
            x, y, z = wgs84_to_ecef(lon, lat, alt)
            lon2, lat2, alt2 = ecef_to_wgs84(x, y, z)
            assert np.isclose(lon2, lon, atol=1e-9)
            assert np.isclose(lat2, lat, atol=1e-9)
            assert np.isclose(alt2, alt, atol=1e-6)

    def test_enu_matrix_orthonormal_and_up(self):
        r = enu_to_ecef_matrix(24.94, 60.17)  # Helsinki
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-12)
        # Up vector in ENU (0,0,1) maps to the geodetic surface normal
        lam, phi = np.radians(24.94), np.radians(60.17)
        normal = np.array(
            [np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)]
        )
        up_ecef = r @ np.array([0.0, 0.0, 1.0])
        assert np.allclose(up_ecef, normal, atol=1e-12)
        # and moving up in ENU increases ellipsoidal altitude 1:1
        x, y, z = wgs84_to_ecef(24.94, 60.17, 0.0)
        _, _, alt = ecef_to_wgs84(*(np.array([x, y, z]) + 100.0 * up_ecef))
        assert np.isclose(alt, 100.0, atol=1e-6)

    def test_haversine(self):
        # one degree of latitude at the equator on the 6371 km sphere
        d = haversine_m(0, 0, 1, 0)
        assert np.isclose(d, 6371000 * np.radians(1.0))

    def test_affine_proj_roundtrip(self, rng):
        m = np.eye(4)
        m[:3, :] += rng.normal(size=(3, 4)) * 0.1
        s = affine_to_proj(m)
        assert s.startswith("+proj=affine")
        m2 = proj_to_affine(s)
        assert np.allclose(m2, m[:3, :])

    def test_pixel_to_wgs84_affine(self):
        bb = dict(left=24.0, bottom=60.0, right=24.1, top=60.1)
        aff = pixel_to_wgs84_affine(101, 101, **bb)
        # pixel (0,0) is top-left
        tl = aff @ np.array([0, 0, 0, 1.0])
        assert np.allclose(tl[:2], [24.0, 60.1])
        br = aff @ np.array([100, 100, 0, 1.0])
        assert np.allclose(br[:2], [24.1, 60.0])
        # z scale is negative (ESD -> ENU flip) and plausible meters/"pixel"
        assert aff[2, 2] < 0


class TestUTM:
    def test_zone(self):
        assert utm_zone(-122.4194) == 10
        assert utm_zone(24.94) == 35

    def test_known_value_eiffel(self):
        # Eiffel Tower, commonly cited UTM 31N ~448252E ~5411950N
        e, n, zone = wgs84_to_utm(2.2945, 48.8584)
        assert zone == 31
        assert abs(e - 448252) < 25
        assert abs(n - 5411950) < 25

    def test_meridian_arc_exact(self):
        # On the central meridian, northing must equal k0 * meridian arc
        # (independent check via numerical quadrature of the meridian radius)
        from scipy.integrate import quad

        from gisnav_tpu.geometry.crs import WGS84_A, WGS84_E2

        def meridian_radius(phi):
            return (
                WGS84_A * (1 - WGS84_E2) / (1 - WGS84_E2 * np.sin(phi) ** 2) ** 1.5
            )

        for lat in (12.3, 48.8584, -33.9):
            arc, _ = quad(meridian_radius, 0, np.radians(abs(lat)), epsabs=1e-8)
            e, n, _ = wgs84_to_utm(3.0, lat, zone=31)
            if lat < 0:
                n = 10000000.0 - n
            assert abs(n - 0.9996 * arc) < 1e-6

    def test_central_meridian(self):
        e, n, _ = wgs84_to_utm(3.0, 0.0, zone=31)
        assert np.isclose(e, 500000.0, atol=1e-6)
        assert np.isclose(n, 0.0, atol=1e-6)

    def test_roundtrip(self, rng):
        for _ in range(30):
            lon0 = rng.uniform(-177, 177)
            zone = utm_zone(lon0)
            lon = lon0 + rng.uniform(-1.5, 1.5)
            lat = rng.uniform(-80, 84)
            e, n, _ = wgs84_to_utm(lon, lat, zone=zone)
            lon2, lat2 = utm_to_wgs84(e, n, zone, south=lat < 0)
            assert np.isclose(lon2, lon, atol=1e-9)
            assert np.isclose(lat2, lat, atol=1e-9)

    def test_enu_offset(self):
        # 1000 m north at the equator. The UTM-grid-offset strategy (same as
        # the reference, bbox_node.py:224-260) carries grid-scale distortion
        # up to ~0.1% away from the central meridian — fine for bbox padding.
        lon, lat = enu_offset_to_wgs84(0.0, 0.0, 0.0, 1000.0)
        # meridian arc: ~110574 m/deg at equator
        assert abs(float(lat) * 110574.0 - 1000.0) < 5.0
        assert abs(float(lon)) < 1e-6  # mm-level meridian-convergence drift
        # at the central meridian the distortion is just k0
        lon, lat = enu_offset_to_wgs84(3.0, 0.0, 0.0, 1000.0)
        assert abs(float(lat) * 110574.0 - 1000.0 / 0.9996) < 0.5


class TestBBox:
    def test_overlap(self):
        a = BBox(0, 0, 2, 2)
        assert np.isclose(bbox_overlap_fraction(a, a), 1.0)
        b = BBox(1, 0, 3, 2)
        assert np.isclose(bbox_overlap_fraction(a, b), 0.5)
        c = BBox(5, 5, 6, 6)
        assert bbox_overlap_fraction(a, c) == 0.0

    def test_fov_projection_nadir(self):
        # Camera pointing straight down from 100 m: optical frame z (forward)
        # maps to ENU -z => R diag(1,-1,-1)
        k = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        r = np.diag([1.0, -1.0, -1.0])
        pts = project_fov_to_ground(k, 640, 480, r, 100.0)
        assert pts is not None and pts.shape == (5, 2)
        # principal point projects to origin
        assert np.allclose(pts[4], [0, 0], atol=1e-9)
        # half-width on ground = alt * (w/2)/fx = 100*320/400 = 80 m
        assert np.isclose(np.max(np.abs(pts[:4, 0])), 100 * 320 / 400, atol=0.5)

    def test_fov_projection_horizontal_returns_none(self):
        k = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        pts = project_fov_to_ground(k, 640, 480, np.eye(3), 100.0)
        assert pts is None

    def test_square_and_pad(self):
        rect = np.array([[0, 0], [4, 0], [4, 2], [0, 2.0]])
        out = square_and_pad(rect)
        # squared: 4x4 centered on (2,1); padded by side 4 on all sides
        assert np.allclose(out.min(axis=0), [-4, -5])
        assert np.allclose(out.max(axis=0), [8, 7])

    def test_full_bbox_pipeline(self):
        k = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        r = np.diag([1.0, -1.0, -1.0])
        bb = fov_bounding_box_enu(k, 640, 480, r, 100.0, 24.94, 60.17)
        assert bb is not None
        assert bb.left < 24.94 < bb.right
        assert bb.bottom < 60.17 < bb.top
        # squared+padded box should be ~3x FOV halfwidth each side (~480 m)
        width_m = haversine_m(60.17, bb.left, 60.17, bb.right)
        assert 400 < width_m < 600


class TestJaxOps:
    def test_rodrigues_matches_cv2(self, rng):
        import cv2
        import jax.numpy as jnp

        from gisnav_tpu.geometry.jaxops import inverse_rodrigues, rodrigues

        for _ in range(10):
            rvec = rng.normal(size=3)
            want, _ = cv2.Rodrigues(rvec)
            got = rodrigues(jnp.asarray(rvec))
            assert np.allclose(got, want, atol=1e-6)
            rvec2 = inverse_rodrigues(jnp.asarray(want))
            assert np.allclose(rvec2, rvec, atol=1e-6)

    def test_ecef_jax_matches_host(self, rng):
        import jax.numpy as jnp

        from gisnav_tpu.geometry.jaxops import ecef_to_wgs84_jax, wgs84_to_ecef_jax

        lon, lat, alt = 24.94, 60.17, 150.0
        xyz = wgs84_to_ecef_jax(lon, lat, alt)
        want = wgs84_to_ecef(lon, lat, alt)
        assert np.allclose(xyz, want)
        lon2, lat2, alt2 = ecef_to_wgs84_jax(jnp.asarray(xyz))
        assert np.isclose(float(lon2), lon, atol=1e-9)
        assert np.isclose(float(lat2), lat, atol=1e-9)
        assert np.isclose(float(alt2), alt, atol=1e-5)

    def test_matrix_to_quat_jax(self, rng):
        import jax
        import jax.numpy as jnp

        from gisnav_tpu.geometry.jaxops import matrix_to_quat_jax

        ms = Rotation.random(16, random_state=3).as_matrix()
        qs = jax.vmap(matrix_to_quat_jax)(jnp.asarray(ms))
        want = Rotation.from_matrix(ms).as_quat()
        for q, w in zip(np.asarray(qs), want):
            assert np.allclose(q, w, atol=1e-6) or np.allclose(q, -w, atol=1e-6)


class TestCRSPropertyRoundtrips:
    """Property-style round-trip checks over randomized inputs (PLAN item:
    hypothesis-like coverage without the dependency)."""

    def test_wgs84_ecef_roundtrip_random(self):
        from gisnav_tpu.geometry.crs import ecef_to_wgs84, wgs84_to_ecef

        rng = np.random.default_rng(42)
        for _ in range(200):
            lon = float(rng.uniform(-180, 180))
            lat = float(rng.uniform(-89.9, 89.9))
            alt = float(rng.uniform(-400, 40000))
            x, y, z = wgs84_to_ecef(lon, lat, alt)
            lon2, lat2, alt2 = ecef_to_wgs84(x, y, z)
            assert abs(lon - lon2) < 1e-9 or abs(abs(lon) - 180) < 1e-6
            assert abs(lat - lat2) < 1e-9
            assert abs(alt - alt2) < 1e-6

    def test_quat_matrix_roundtrip_random(self):
        from gisnav_tpu.geometry.quaternion import (
            matrix_to_quat,
            quat_to_matrix,
        )

        rng = np.random.default_rng(7)
        for _ in range(200):
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            q2 = matrix_to_quat(quat_to_matrix(q))
            # q and -q are the same rotation
            assert (np.allclose(q, q2, atol=1e-6)
                    or np.allclose(q, -q2, atol=1e-6))

    def test_pixel_affine_corners_random(self):
        from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine

        rng = np.random.default_rng(3)
        for _ in range(50):
            h, w = int(rng.integers(64, 4096)), int(rng.integers(64, 4096))
            left, right = sorted(rng.uniform(-179, 179, 2))
            bottom, top = sorted(rng.uniform(-85, 85, 2))
            if right - left < 1e-6 or top - bottom < 1e-6:
                continue
            aff = pixel_to_wgs84_affine(h, w, left, bottom, right, top)
            # top-left pixel center maps into the bbox near (left, top)
            tl = aff @ np.array([0.0, 0.0, 0.0, 1.0])
            br = aff @ np.array([w - 1.0, h - 1.0, 0.0, 1.0])
            assert left <= tl[0] <= right and bottom <= tl[1] <= top
            assert abs(tl[0] - left) < (right - left) / w * 2
            assert abs(tl[1] - top) < (top - bottom) / h * 2
            assert abs(br[0] - right) < (right - left) / w * 2
            assert abs(br[1] - bottom) < (top - bottom) / h * 2
