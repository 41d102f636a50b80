"""Tests for SuperPoint extraction, NMS, SIFT wire format."""
import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.features import SuperPoint, select_keypoints, simple_nms
from gisnav_tpu.features.sift import (
    SiftFeatures,
    extract_sift,
    pack_keypoints,
    pad_features,
    unpack_keypoints,
)


class TestNMS:
    def test_simple_nms_golden(self):
        s = np.zeros((16, 16), np.float32)
        s[4, 4] = 1.0
        s[5, 5] = 0.5  # suppressed by (4,4) within radius 4
        s[12, 12] = 0.8
        out = np.asarray(simple_nms(jnp.asarray(s), radius=4))
        assert out[4, 4] == 1.0
        assert out[5, 5] == 0.0
        assert out[12, 12] == 0.8

    def test_select_keypoints_static_shape_and_border(self):
        rng = np.random.default_rng(0)
        heat = rng.uniform(0, 1, (64, 96)).astype(np.float32)
        kpts, scores, valid = select_keypoints(jnp.asarray(heat), 128, border=8)
        assert kpts.shape == (128, 2)
        kv = np.asarray(kpts)[np.asarray(valid)]
        # sub-pixel refinement may move peaks by up to half a pixel
        assert (kv[:, 0] >= 7.5).all() and (kv[:, 0] < 87.5).all()
        assert (kv[:, 1] >= 7.5).all() and (kv[:, 1] < 55.5).all()
        # scores sorted descending
        s = np.asarray(scores)
        assert (np.diff(s) <= 1e-7).all()


class TestSuperPoint:
    def test_forward_shapes_and_invariants(self):
        model = SuperPoint(max_keypoints=256)
        img = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (120, 160)).astype(np.float32)
        )
        params = model.init(jax.random.PRNGKey(0), img)
        feats = model.apply(params, img)
        assert feats.keypoints.shape == (256, 2)
        assert feats.descriptors.shape == (256, 256)
        assert feats.scores.shape == (256,)
        # descriptors are unit length
        norms = np.linalg.norm(np.asarray(feats.descriptors), axis=1)
        assert np.allclose(norms, 1.0, atol=1e-4)

    def test_jit_reuse(self):
        model = SuperPoint(max_keypoints=64)
        rng = np.random.default_rng(2)
        img1 = jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32))
        img2 = jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img1)
        f = jax.jit(model.apply)
        a = f(params, img1)
        b = f(params, img2)
        assert not np.allclose(np.asarray(a.scores), np.asarray(b.scores))


class TestSiftWire:
    def _checkerboardish(self, rng):
        img = (rng.uniform(0, 1, (240, 320)) > 0.5).astype(np.uint8) * 255
        import cv2

        return cv2.GaussianBlur(img, (5, 5), 1.0)

    def test_extract_and_roundtrip(self, rng):
        img = self._checkerboardish(rng)
        pts, sizes, angles, descs = extract_sift(img, max_keypoints=512)
        assert len(pts) > 50
        feats = pad_features(pts, sizes, angles, descs, 512)
        raw = pack_keypoints(feats)
        # wire record must be 133 float32s = 532 bytes (reference layout)
        assert len(raw) % 532 == 0
        back = unpack_keypoints(raw, 512)
        n = int(feats.mask.sum())
        assert np.allclose(back.keypoints[:n], feats.keypoints[:n])
        assert np.allclose(back.descriptors[:n], feats.descriptors[:n])
        assert back.mask.sum() == feats.mask.sum()

    def test_empty_image(self):
        img = np.zeros((64, 64), np.uint8)
        pts, sizes, angles, descs = extract_sift(img)
        feats = pad_features(pts, sizes, angles, descs, 128)
        assert feats.mask.sum() == 0
        assert isinstance(feats, SiftFeatures)


class TestSubpixelRefinement:
    def test_refines_toward_true_peak(self):
        from gisnav_tpu.features.nms import refine_subpixel

        # gaussian bump centered at (10.3, 7.6) sampled on the grid
        ys, xs = np.mgrid[0:16, 0:20]
        heat = np.exp(-((xs - 10.3) ** 2 + (ys - 7.6) ** 2) / 2.0)
        kp = jnp.asarray(np.array([[10.0, 8.0]], np.float32))
        out = np.asarray(refine_subpixel(jnp.asarray(heat.astype(np.float32)),
                                         kp))
        # moves toward the true sub-pixel center
        assert abs(out[0, 0] - 10.3) < abs(10.0 - 10.3) + 1e-6
        assert abs(out[0, 1] - 7.6) < abs(8.0 - 7.6) + 1e-6
        # offsets bounded by half a pixel
        assert np.all(np.abs(out - np.asarray(kp)) <= 0.5 + 1e-6)

    def test_offset_maps_match_gather_refine(self):
        """The vectorized full-map soft-argmax (gather-free TPU path) must
        agree with the per-keypoint window-gather reference everywhere,
        including clamped image borders."""
        from gisnav_tpu.features.nms import (
            _softargmax_offset_maps,
            refine_subpixel,
        )

        rng = np.random.default_rng(3)
        heat = jnp.asarray(rng.uniform(0, 1, (24, 32)).astype(np.float32))
        ys, xs = np.mgrid[0:24, 0:32]
        kp = jnp.asarray(
            np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32))
        ref = np.asarray(refine_subpixel(heat, kp))
        dx, dy = _softargmax_offset_maps(heat)
        got_x = np.asarray(kp[:, 0] + np.asarray(dx).ravel())
        got_y = np.asarray(kp[:, 1] + np.asarray(dy).ravel())
        np.testing.assert_allclose(got_x, ref[:, 0], atol=1e-5)
        np.testing.assert_allclose(got_y, ref[:, 1], atol=1e-5)

    def test_cell_table_matches_scattered_gather_selection(self):
        """Table-based select (one row-gather per keypoint) must reproduce
        the previous scattered patch-gather + window-gather selection."""
        from gisnav_tpu.features.nms import (
            refine_subpixel,
            select_keypoints,
            simple_nms,
        )

        rng = np.random.default_rng(11)
        heat = jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32))
        kp, sc, valid = select_keypoints(heat, 32, border=4)

        # reference: the pre-table implementation, spelled out
        block, border = 4, 4
        h, w = heat.shape
        nms = simple_nms(heat, 4)
        ysg, xsg = np.mgrid[0:h, 0:w]
        inb = ((xsg >= border) & (xsg < w - border) &
               (ysg >= border) & (ysg < h - border))
        nms = jnp.where(jnp.asarray(inb), nms, 0.0)
        hb, wb = h // block, w // block
        cells = np.asarray(nms).reshape(hb, block, wb, block)
        cells = cells.transpose(0, 2, 1, 3).reshape(hb * wb, block * block)
        cell_max = cells.max(1)
        order = np.argsort(-cell_max)[:32]
        ref_scores = cell_max[order]
        inner = cells.argmax(1)[order]
        by = (order // wb) * block + inner // block
        bx = (order % wb) * block + inner % block
        ref_kp = np.asarray(refine_subpixel(
            heat, jnp.asarray(np.stack([bx, by], 1).astype(np.float32))))

        got = sorted(zip(np.asarray(sc).tolist(),
                         np.asarray(kp).tolist()), reverse=True)
        want = sorted(zip(ref_scores.tolist(), ref_kp.tolist()),
                      reverse=True)
        for (gs, gk), (ws_, wk) in zip(got, want):
            assert abs(gs - ws_) < 1e-5
            np.testing.assert_allclose(gk, wk, atol=1e-4)

    def test_flat_heatmap_no_motion_blowup(self):
        from gisnav_tpu.features.nms import refine_subpixel

        heat = jnp.ones((16, 16), jnp.float32)
        kp = jnp.asarray(np.array([[0.0, 0.0], [15.0, 15.0]], np.float32))
        out = np.asarray(refine_subpixel(heat, kp))
        assert np.isfinite(out).all()
        assert np.all(np.abs(out - np.asarray(kp)) <= 0.5 + 1e-6)
