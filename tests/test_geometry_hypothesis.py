"""Property-based geometry tests (hypothesis).

Upgrades the hand-rolled randomized loops of ``test_geometry.py`` to real
property-based testing now that ``hypothesis`` is available in the image
(PLAN.md robustness item). These cover the algebraic laws the pipeline
relies on — the reference gets them for free from battle-tested libraries
(pyproj, tf_transformations; ``_transformations.py`` in hmakelin/gisnav),
so our self-contained reimplementations carry the proof burden.

All functions under test are host-side numpy (no jit), so examples are
cheap; budgets are kept modest to bound suite time.
"""
import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from gisnav_tpu.geometry.crs import (  # noqa: E402
    affine_to_proj,
    ecef_to_wgs84,
    enu_to_ecef_matrix,
    proj_to_affine,
    wgs84_to_ecef,
)
from gisnav_tpu.geometry.quaternion import (  # noqa: E402
    angle_off_nadir,
    matrix_to_quat,
    quat_conjugate,
    quat_inverse,
    quat_mul,
    quat_rotate,
    quat_slerp,
    quat_to_matrix,
)
from gisnav_tpu.geometry.se3 import (  # noqa: E402
    compose,
    invert,
    make_transform,
    split_transform,
)
from gisnav_tpu.geometry.tm import utm_to_wgs84, wgs84_to_utm  # noqa: E402

MAX_EXAMPLES = 80
DEADLINE = None  # first call may page code in; wall-time is bounded anyway

finite = dict(allow_nan=False, allow_infinity=False)


def quats():
    """Unit quaternions, rejection-sampled away from the origin."""
    comp = st.floats(-1.0, 1.0, **finite)
    return (
        st.tuples(comp, comp, comp, comp)
        .map(np.array)
        .filter(lambda q: np.linalg.norm(q) > 1e-2)
        .map(lambda q: q / np.linalg.norm(q))
    )


def vectors(scale=1e3):
    comp = st.floats(-scale, scale, **finite)
    return st.tuples(comp, comp, comp).map(np.array)


class TestQuaternionLaws:
    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), quats())
    def test_mul_preserves_norm(self, q1, q2):
        assert np.isclose(np.linalg.norm(quat_mul(q1, q2)), 1.0, atol=1e-9)

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), quats(), quats())
    def test_mul_associative(self, q1, q2, q3):
        lhs = quat_mul(quat_mul(q1, q2), q3)
        rhs = quat_mul(q1, quat_mul(q2, q3))
        assert np.allclose(lhs, rhs, atol=1e-12)

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats())
    def test_inverse_is_identity(self, q):
        ident = quat_mul(q, quat_inverse(q))
        assert np.allclose(np.abs(ident), [0, 0, 0, 1], atol=1e-9)

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), vectors())
    def test_rotate_matches_matrix(self, q, v):
        assert np.allclose(
            quat_rotate(q, v), quat_to_matrix(q) @ v,
            atol=1e-6 * max(1.0, np.linalg.norm(v)),
        )

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), vectors())
    def test_rotate_preserves_length(self, q, v):
        assert np.isclose(
            np.linalg.norm(quat_rotate(q, v)), np.linalg.norm(v),
            rtol=1e-9, atol=1e-9,
        )

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), quats())
    def test_conjugate_antihomomorphism(self, q1, q2):
        # (q1 q2)* == q2* q1*
        assert np.allclose(
            quat_conjugate(quat_mul(q1, q2)),
            quat_mul(quat_conjugate(q2), quat_conjugate(q1)),
            atol=1e-12,
        )

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats())
    def test_matrix_roundtrip_up_to_sign(self, q):
        q2 = matrix_to_quat(quat_to_matrix(q))
        assert (np.allclose(q, q2, atol=1e-7)
                or np.allclose(q, -q2, atol=1e-7))

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats())
    def test_matrix_is_special_orthogonal(self, q):
        m = quat_to_matrix(q)
        assert np.allclose(m @ m.T, np.eye(3), atol=1e-9)
        assert np.isclose(np.linalg.det(m), 1.0, atol=1e-9)

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), quats(), st.floats(0.0, 1.0, **finite))
    def test_slerp_stays_unit(self, q0, q1, t):
        assert np.isclose(
            np.linalg.norm(quat_slerp(q0, q1, t)), 1.0, atol=1e-9
        )

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats())
    def test_angle_off_nadir_range(self, q):
        a = angle_off_nadir(q)
        assert 0.0 <= a <= np.pi + 1e-12


class TestSE3Laws:
    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), vectors())
    def test_invert_is_inverse(self, q, t):
        h = make_transform(quat_to_matrix(q), t)
        assert np.allclose(compose(h, invert(h)), np.eye(4), atol=1e-6)
        assert np.allclose(compose(invert(h), h), np.eye(4), atol=1e-6)

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), vectors(), quats(), vectors())
    def test_compose_inverse_distributes(self, q1, t1, q2, t2):
        h1 = make_transform(quat_to_matrix(q1), t1)
        h2 = make_transform(quat_to_matrix(q2), t2)
        assert np.allclose(
            invert(compose(h1, h2)), compose(invert(h2), invert(h1)),
            atol=1e-5,
        )

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(quats(), vectors())
    def test_split_roundtrip(self, q, t):
        r = quat_to_matrix(q)
        r2, t2 = split_transform(make_transform(r, t))
        assert np.allclose(r, r2) and np.allclose(t, t2)


class TestCRSLaws:
    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(
        st.floats(-180, 180, **finite),
        st.floats(-89.9, 89.9, **finite),
        st.floats(-400, 40000, **finite),
    )
    def test_wgs84_ecef_roundtrip(self, lon, lat, alt):
        x, y, z = wgs84_to_ecef(lon, lat, alt)
        lon2, lat2, alt2 = ecef_to_wgs84(x, y, z)
        # longitude is degenerate at the antimeridian
        dlon = abs(lon - lon2)
        assert min(dlon, 360 - dlon) < 1e-9 or abs(lat) > 89.0
        assert abs(lat - lat2) < 1e-9
        assert abs(alt - alt2) < 1e-5

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(st.floats(-180, 180, **finite), st.floats(-89.9, 89.9, **finite))
    def test_enu_matrix_orthonormal(self, lon, lat):
        m = enu_to_ecef_matrix(lon, lat)
        assert np.allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(m), 1.0, atol=1e-12)

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(
        st.floats(-179.5, 179.5, **finite),
        st.floats(-80, 84, **finite),
    )
    def test_utm_roundtrip(self, lon, lat):
        e, n, zone = wgs84_to_utm(lon, lat)
        lon2, lat2 = utm_to_wgs84(e, n, zone, south=lat < 0)
        assert abs(float(lon2) - lon) < 1e-8 / max(np.cos(np.radians(lat)), 1e-3)
        assert abs(float(lat2) - lat) < 1e-8

    @settings(max_examples=MAX_EXAMPLES, deadline=DEADLINE)
    @given(st.lists(st.floats(-1e3, 1e3, **finite), min_size=12, max_size=12))
    def test_affine_proj_codec_roundtrip(self, coeffs):
        m = np.eye(4)
        m[:3, :] = np.array(coeffs).reshape(3, 4)
        m2 = proj_to_affine(affine_to_proj(m))  # returns the (3, 4) part
        # wire format carries full repr precision
        assert np.allclose(m[:3, :], m2, rtol=1e-12, atol=1e-12)
