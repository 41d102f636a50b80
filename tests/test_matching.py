"""Tests for the LightGlue matcher and the classical MNN/ratio matcher."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.features.sift import extract_sift, pad_features
from gisnav_tpu.features.superpoint import SuperPointFeatures
from gisnav_tpu.matching import LightGlue, match_features, mnn_ratio_match, root_sift


def _fake_feats(rng, k, d=256, h=480, w=640, n_valid=None):
    n_valid = k if n_valid is None else n_valid
    kp = rng.uniform(0, [w, h], size=(k, 2)).astype(np.float32)
    desc = rng.normal(size=(k, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    mask = np.arange(k) < n_valid
    return SuperPointFeatures(
        keypoints=jnp.asarray(kp),
        scores=jnp.asarray(mask.astype(np.float32)),
        descriptors=jnp.asarray(desc),
        mask=jnp.asarray(mask),
    )


class TestLightGlue:
    def _init(self, k=64, depth=2):
        rng = np.random.default_rng(0)
        f0 = _fake_feats(rng, k)
        f1 = _fake_feats(rng, k)
        model = LightGlue(depth=depth)
        params = model.init(
            jax.random.PRNGKey(0),
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
        )
        return model, params, f0, f1

    def test_shapes(self):
        model, params, f0, f1 = self._init()
        res = match_features(params, f0, (480, 640), f1, (480, 640), depth=2)
        assert res.matches0.shape == (64,)
        assert res.scores.shape == (64, 64)
        s = np.asarray(res.scores)
        assert (s >= 0).all() and (s <= 1).all()
        # row sums of the assignment are at most 1 (double-softmax * sigmoid)
        assert (s.sum(axis=1) <= 1.0 + 1e-4).all()

    def test_masked_never_matched(self):
        rng = np.random.default_rng(3)
        f0 = _fake_feats(rng, 64, n_valid=40)
        f1 = _fake_feats(rng, 64, n_valid=30)
        model = LightGlue(depth=2, filter_threshold=0.0)
        params = model.init(
            jax.random.PRNGKey(0),
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
        )
        res = match_features(params, f0, (480, 640), f1, (480, 640), depth=2,
                             filter_threshold=0.0)
        m0 = np.asarray(res.matches0)
        # padded queries unmatched; matched targets only within valid range
        assert (m0[40:] == -1).all()
        assert (m0[m0 >= 0] < 30).all()
        s = np.asarray(res.scores)
        assert np.allclose(s[40:, :], 0.0)
        assert np.allclose(s[:, 30:], 0.0)

    def test_mutual_consistency(self):
        model, params, f0, f1 = self._init()
        res = match_features(params, f0, (480, 640), f1, (480, 640), depth=2,
                             filter_threshold=0.0)
        m0 = np.asarray(res.matches0)
        m1 = np.asarray(res.matches1)
        for i, j in enumerate(m0):
            if j >= 0:
                assert m1[j] == i

    def test_sift_variant_input_dim(self):
        rng = np.random.default_rng(4)
        f0 = _fake_feats(rng, 32, d=128)
        f1 = _fake_feats(rng, 32, d=128)
        model = LightGlue(input_dim=128, depth=1)
        params = model.init(
            jax.random.PRNGKey(0),
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
        )
        res = model.apply(
            params,
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
        )
        assert res.matches0.shape == (32,)


class TestLightGlueFused:
    """The fused Mosaic forward restructures the flax computation (rotary via
    weight permutation, concat-free FFN, 2D head layout). On CPU its blocks
    run through the XLA reference mirror, so this validates the restructure
    itself; the Pallas kernels are covered by test_tpu_parity.py."""

    def _pair(self, k=512, depth=2):
        rng = np.random.default_rng(7)
        f0 = _fake_feats(rng, k, n_valid=k - 37)
        # correlated descriptors so real (high-score) matches exist
        d1 = np.asarray(f0.descriptors) + 0.1 * rng.normal(size=(k, 256))
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        f1 = SuperPointFeatures(
            keypoints=f0.keypoints + 3.0,
            scores=f0.scores,
            descriptors=jnp.asarray(d1.astype(np.float32)),
            mask=jnp.asarray(np.arange(k) < k - 11),
        )
        model = LightGlue(depth=depth)
        params = model.init(
            jax.random.PRNGKey(0),
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
        )
        return model, params, f0, f1

    def test_supported_gate(self):
        from gisnav_tpu.matching.lightglue_fused import fused_lightglue_supported

        assert fused_lightglue_supported(2048, 4096, 256, 4)
        assert not fused_lightglue_supported(2048, 4096 + 64, 256, 4)
        assert not fused_lightglue_supported(2048, 4096, 128, 4)

    def test_matches_flax_module(self):
        from gisnav_tpu.matching.lightglue_fused import lightglue_fused_forward

        model, params, f0, f1 = self._pair()
        ref = model.apply(
            params,
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
        )
        got = lightglue_fused_forward(
            params,
            f0.keypoints, f0.descriptors, f0.mask, (480, 640),
            f1.keypoints, f1.descriptors, f1.mask, (480, 640),
            depth=model.depth,
        )
        ref_s = np.asarray(ref.scores)
        got_s = np.asarray(got.scores)
        assert np.abs(ref_s - got_s).max() < 0.02
        agree = (np.asarray(ref.matches0) == np.asarray(got.matches0)).mean()
        assert agree > 0.98

    def test_fused_block_grad_matches_reference(self):
        """custom_vjp backward recomputes through the XLA mirror."""
        from gisnav_tpu.matching import lightglue_fused as lgf

        rng = np.random.default_rng(1)
        k, dim, heads = 512, 256, 4
        x = jnp.asarray(rng.normal(0, 1, (k, dim)).astype(np.float32))
        q = jnp.asarray(rng.normal(0, 1, (k, dim)).astype(np.float32))
        bias = jnp.zeros((1, k), jnp.float32)
        wout = jnp.asarray(rng.normal(0, 0.05, (dim, dim)).astype(np.float32))
        bout = jnp.zeros((1, dim))
        w1x = jnp.asarray(rng.normal(0, 0.05, (dim, 2 * dim)).astype(np.float32))
        w1m = jnp.asarray(rng.normal(0, 0.05, (dim, 2 * dim)).astype(np.float32))
        b1 = jnp.zeros((1, 2 * dim))
        lns = jnp.ones((1, 2 * dim))
        lnb = jnp.zeros((1, 2 * dim))
        w2 = jnp.asarray(rng.normal(0, 0.05, (2 * dim, dim)).astype(np.float32))
        b2 = jnp.zeros((1, dim))
        args = (q.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                q.astype(jnp.bfloat16), bias, wout, bout, w1x, w1m, b1,
                lns, lnb, w2, b2)

        def loss_fused(xv):
            return jnp.sum(lgf.fused_block(xv, *args, 4) ** 2)

        def loss_ref(xv):
            return jnp.sum(lgf._block_reference(xv, *args, heads=4) ** 2)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-4
        )


class TestRootSift:
    def test_matches_reference_formula(self, rng):
        desc = rng.uniform(0, 255, (10, 128)).astype(np.float32)
        got = np.asarray(root_sift(jnp.asarray(desc)))
        want = np.sqrt(desc / np.linalg.norm(desc, ord=1, axis=1, keepdims=True))
        assert np.allclose(got, want, atol=1e-6)
        # unit L2 norm afterwards
        assert np.allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)


class TestMNNRatio:
    def _sift_pair(self, rng):
        img = (rng.uniform(0, 1, (240, 320)) > 0.5).astype(np.uint8) * 255
        img = cv2.GaussianBlur(img, (5, 5), 1.0)
        m = cv2.getRotationMatrix2D((160, 120), 15.0, 1.0)
        img2 = cv2.warpAffine(img, m, (320, 240))
        return img, img2

    def test_parity_with_cv2_bfmatcher(self, rng):
        img1, img2 = self._sift_pair(rng)
        p1, s1, a1, d1 = extract_sift(img1, 512)
        p2, s2, a2, d2 = extract_sift(img2, 512)

        bf = cv2.BFMatcher()
        knn = bf.knnMatch(d1, d2, k=2)
        cv2_matches = {}
        for m, n in knn:
            if m.distance < 0.7 * n.distance:
                cv2_matches[m.queryIdx] = m.trainIdx

        f1 = pad_features(p1, s1, a1, d1, 512)
        f2 = pad_features(p2, s2, a2, d2, 512)
        got, dists = mnn_ratio_match(
            jnp.asarray(f1.descriptors), jnp.asarray(f2.descriptors),
            jnp.asarray(f1.mask), jnp.asarray(f2.mask),
            ratio=0.7, mutual=False,
        )
        got = np.asarray(got)
        ours = {i: j for i, j in enumerate(got) if j >= 0}
        # essentially identical match sets (float tie-breaks may differ)
        common = set(cv2_matches.items()) & set(ours.items())
        assert len(common) >= 0.95 * max(len(cv2_matches), 1)
        assert abs(len(ours) - len(cv2_matches)) <= 0.05 * max(len(cv2_matches), 1)

    def test_mutual_flag_is_stricter(self, rng):
        img1, img2 = self._sift_pair(rng)
        p1, s1, a1, d1 = extract_sift(img1, 256)
        p2, s2, a2, d2 = extract_sift(img2, 256)
        f1 = pad_features(p1, s1, a1, d1, 256)
        f2 = pad_features(p2, s2, a2, d2, 256)
        m_plain, _ = mnn_ratio_match(
            jnp.asarray(f1.descriptors), jnp.asarray(f2.descriptors),
            jnp.asarray(f1.mask), jnp.asarray(f2.mask), mutual=False)
        m_mutual, _ = mnn_ratio_match(
            jnp.asarray(f1.descriptors), jnp.asarray(f2.descriptors),
            jnp.asarray(f1.mask), jnp.asarray(f2.mask), mutual=True)
        n_plain = int((np.asarray(m_plain) >= 0).sum())
        n_mutual = int((np.asarray(m_mutual) >= 0).sum())
        assert n_mutual <= n_plain
        assert n_mutual > 0
