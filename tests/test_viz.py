"""Dev-visualization helpers (reference parity: ~/dev/matches_image and
~/dev/position_image, ``core/pose_node.py:145-151,310-346``)."""
import numpy as np

from gisnav_tpu.nodes.viz import draw_matches, draw_position


class TestDrawMatches:
    def test_canvas_layout_and_lines(self):
        q = np.full((48, 64), 30, np.uint8)
        r = np.full((64, 80), 60, np.uint8)
        kq = np.array([[10.0, 10.0], [20.0, 20.0], [5.0, 5.0]])
        kr = np.array([[15.0, 12.0], [25.0, 22.0], [7.0, 9.0]])
        mask = np.array([True, True, False])
        img = draw_matches(q, r, kq, kr, mask)
        assert img.shape == (64, 144, 3)
        # drawn annotations are colored: some pixels differ across channels
        assert (img[:, :, 1] != img[:, :, 2]).any()
        # the masked-out third pair must not be drawn at its query point
        assert (img[5, 5] == (30, 30, 30)).all()

    def test_respects_max_draw(self):
        q = np.zeros((32, 32), np.uint8)
        r = np.zeros((32, 32), np.uint8)
        k = np.tile(np.array([[5.0, 5.0]]), (50, 1))
        img = draw_matches(q, r, k, k, np.ones(50, bool), max_draw=3)
        assert img is not None


class TestDrawPosition:
    def test_marks_position(self):
        ref = np.zeros((64, 64), np.uint8)
        img = draw_position(ref, np.array([32.0, 40.0, 100.0]))
        assert img is not None
        # green disc at the position (off the red center cross, which
        # overdraws the exact center along the axes)
        assert img[44, 36, 1] > 200

    def test_outside_raster_returns_none(self):
        """The reference warns and skips when the solved position is off the
        raster (pose_node.py:336-343)."""
        ref = np.zeros((64, 64), np.uint8)
        assert draw_position(ref, np.array([-5.0, 10.0, 1.0])) is None
        assert draw_position(ref, np.array([10.0, 99.0, 1.0])) is None

    def test_inlier_spread_drawn(self):
        ref = np.zeros((64, 64), np.uint8)
        pts = np.array([[10.0, 10.0], [20.0, 20.0]])
        img = draw_position(ref, np.array([32.0, 32.0, 1.0]),
                            matched_ref=pts, mask=np.array([True, True]))
        assert (img[10, 10] != (0, 0, 0)).any()
