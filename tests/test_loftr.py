"""Tests for the semi-dense LoFTR-style matcher."""
import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.matching.loftr import LoFTR, _sine_pos_encoding


class TestLoFTR:
    def _model(self, max_matches=128, depth=1):
        return LoFTR(max_matches=max_matches, depth=depth)

    def test_forward_shapes(self):
        rng = np.random.default_rng(0)
        m = self._model()
        img0 = jnp.asarray(rng.uniform(0, 1, (96, 128)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 1, (96, 128)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), img0, img1)
        out = m.apply(params, img0, img1)
        assert out.kp0.shape == (128, 2)
        assert out.kp1.shape == (128, 2)
        assert out.confidence.shape == (128,)
        # keypoints lie inside their images
        kp0 = np.asarray(out.kp0)
        assert (kp0 >= 0).all() and (kp0[:, 0] <= 128).all()
        assert (kp0[:, 1] <= 96).all()

    def test_jit_and_different_sizes(self):
        rng = np.random.default_rng(1)
        m = self._model(max_matches=64)
        img0 = jnp.asarray(rng.uniform(0, 1, (64, 80)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 1, (96, 128)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), img0, img1)
        f = jax.jit(m.apply)
        out = f(params, img0, img1)
        assert np.isfinite(np.asarray(out.kp1)).all()
        kp1 = np.asarray(out.kp1)
        assert (kp1[:, 0] <= 128 + 5).all() and (kp1[:, 1] <= 96 + 5).all()

    def test_identity_pair_matches_same_cells(self):
        """Even untrained, matching an image to itself must be near-diagonal:
        the dual-softmax of identical token sets peaks on the diagonal."""
        rng = np.random.default_rng(2)
        m = self._model(max_matches=64, depth=1)
        img = jnp.asarray(rng.uniform(0, 1, (96, 128)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), img, img)
        out = m.apply(params, img, img)
        valid = np.asarray(out.mask)
        if valid.any():
            d = np.linalg.norm(
                np.asarray(out.kp0)[valid] - np.asarray(out.kp1)[valid],
                axis=1,
            )
            assert np.median(d) < 8.0  # within one coarse cell

    def test_pos_encoding_shape_and_uniqueness(self):
        pe = np.asarray(_sine_pos_encoding(8, 12, 64))
        assert pe.shape == (96, 64)
        # all positions distinct
        assert len({tuple(np.round(r, 5)) for r in pe}) == 96

    def test_gradients_flow(self):
        rng = np.random.default_rng(3)
        m = self._model(max_matches=32, depth=1)
        img0 = jnp.asarray(rng.uniform(0, 1, (64, 80)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 1, (64, 80)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), img0, img1)

        def loss(p):
            out = m.apply(p, img0, img1)
            return jnp.sum(out.confidence)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in leaves)
