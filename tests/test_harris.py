"""Tests for the Harris detector mode and the NaN-safe descriptor gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.features.harris import harris_response
from gisnav_tpu.features.superpoint import SuperPoint


def _corner_image(h=96, w=128):
    img = np.zeros((h, w), np.float32)
    img[30:60, 40:90] = 1.0  # a rectangle: 4 strong corners
    return img


class TestHarrisResponse:
    def test_fires_on_corners_not_edges(self):
        img = _corner_image()
        resp = np.asarray(harris_response(jnp.asarray(img)))
        assert resp.shape == img.shape
        assert resp.min() >= 0 and np.isclose(resp.max(), 1.0)
        # corner neighborhoods beat edge midpoints
        corner = resp[28:33, 38:43].max()
        edge_mid = resp[28:33, 60:70].max()
        assert corner > 5 * max(edge_mid, 1e-6)

    def test_rotation_covariance(self):
        import cv2

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (128, 128)).astype(np.float32)
        img = cv2.GaussianBlur(img, (7, 7), 2.0)
        r0 = np.asarray(harris_response(jnp.asarray(img)))
        rot = cv2.rotate(img, cv2.ROTATE_90_COUNTERCLOCKWISE)
        r90 = np.asarray(harris_response(jnp.asarray(rot)))
        back = cv2.rotate(r90, cv2.ROTATE_90_CLOCKWISE)
        inner = np.s_[8:-8, 8:-8]
        corr = np.corrcoef(r0[inner].ravel(), back[inner].ravel())[0, 1]
        assert corr > 0.95

    def test_constant_image_no_nan(self):
        resp = np.asarray(harris_response(jnp.zeros((64, 64))))
        assert np.isfinite(resp).all()


class TestHarrisMode:
    def test_extractor_repeatable_keypoints(self):
        import cv2

        rng = np.random.default_rng(1)
        img = cv2.GaussianBlur(
            rng.uniform(0, 1, (128, 160)).astype(np.float32), (5, 5), 1.2
        )
        sp = SuperPoint(max_keypoints=64, detector_mode="harris")
        params = sp.init(jax.random.PRNGKey(0), jnp.asarray(img))
        # params must not include the (unused) detector head
        assert "convPb" not in params["params"]
        f1 = sp.apply(params, jnp.asarray(img))
        f2 = sp.apply(params, jnp.asarray(img))
        assert np.allclose(np.asarray(f1.keypoints), np.asarray(f2.keypoints))
        assert int(f1.mask.sum()) > 10

    def test_descriptor_gradients_finite(self):
        """Regression: linalg.norm at a zero row produced NaN gradients
        through the descriptor normalization (maximum() does not protect
        sqrt'(0)); the rsqrt(sumsq + eps) form must stay finite."""
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (128, 160)).astype(np.float32))
        sp = SuperPoint(max_keypoints=64, detector_mode="harris")
        params = sp.init(jax.random.PRNGKey(0), img)

        def loss(p):
            f = sp.apply(p, img)
            return jnp.sum(f.descriptors * f.descriptors[::-1])

        g = jax.grad(loss)(params)
        assert all(
            bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(g)
        )


class TestWeightsIO:
    def test_npz_roundtrip(self, tmp_path):
        from gisnav_tpu.weights import load_npz, save_npz

        params = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3),
                        "c": np.array([1, 2], np.int32)}}
        path = str(tmp_path / "w.npz")
        save_npz(path, params)
        back = load_npz(path)
        assert np.allclose(back["a"]["b"], params["a"]["b"], atol=1e-2)
        assert back["a"]["c"].dtype.kind == "i"
