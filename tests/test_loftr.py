"""Tests for the semi-dense LoFTR-style matcher."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.matching.loftr import LoFTR, _sine_pos_encoding

# heavy compile/e2e module; excluded from the fast subset (-m 'not slow')
pytestmark = pytest.mark.slow


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


class TestSemidensePipeline:
    def test_frame_to_geopose_semidense_runs(self):
        """The LoFTR pipeline variant compiles and returns a GeoPose with
        finite fields on a tiny synthetic scene (random init: validity is
        not asserted, only the program contract)."""
        import dataclasses

        from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine
        from gisnav_tpu.pipeline.geopose import (
            PipelineConfig,
            build_frame_to_geopose_semidense,
            init_semidense_params,
        )

        cfg = PipelineConfig(image_shape=(96, 128), max_keypoints=64,
                             min_matches=8)
        params = init_semidense_params(jax.random.PRNGKey(0), cfg)
        fn = jax.jit(build_frame_to_geopose_semidense(cfg))

        rng = np.random.default_rng(0)
        ortho = jnp.asarray(rng.uniform(0, 1, (256, 256)).astype(np.float32))
        dem = jnp.zeros((256, 256), jnp.float32)
        query = ortho[80:176, 64:192]
        aff = jnp.asarray(pixel_to_wgs84_affine(
            256, 256, 24.0, 60.0, 24.01, 60.005), jnp.float32)
        k = jnp.asarray([[100.0, 0, 64.0], [0, 100.0, 48.0], [0, 0, 1.0]])
        pose = fn(params, query, ortho, dem, jnp.float32(0.0), k, aff,
                  jax.random.PRNGKey(1))
        assert pose.matched_qry.shape == (64, 2)
        assert np.isfinite(np.asarray(pose.lon_lat_alt)).all() or not bool(
            pose.valid)
        assert int(pose.num_matches) >= 0

    def test_pose_node_semidense_backend(self):
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.pose_node import PoseNode

        node = PoseNode(LocalBus(), params={"backend": "semidense"})
        assert node._deep_runner is not None


class TestLoFTRTraining:
    def test_coarse_gt_identity_and_shift(self):
        from gisnav_tpu.train.loftr_steps import _coarse_gt

        h, w = 32, 40  # 4x5 cells
        idx, proj = _coarse_gt(jnp.eye(3), h, w)
        # identity: every cell maps to itself
        np.testing.assert_array_equal(np.asarray(idx), np.arange(20))
        # +8px x-shift: cells map one column right, last column outside
        hom = jnp.eye(3).at[0, 2].set(8.0)
        idx, _ = _coarse_gt(hom, h, w)
        idx = np.asarray(idx).reshape(4, 5)
        np.testing.assert_array_equal(idx[:, :4],
                                      np.arange(20).reshape(4, 5)[:, 1:])
        assert (idx[:, 4] == -1).all()

    def test_train_config_roundtrip(self):
        from gisnav_tpu.train.loftr_steps import (
            LoFTRTrainConfig,
            init_loftr_train_state,
        )

        cfg = LoFTRTrainConfig(image_shape=(32, 40), max_matches=16, depth=1)
        state, tx = init_loftr_train_state(jax.random.PRNGKey(0), cfg)
        assert "loftr" in state.params
        assert int(state.step) == 0
