"""Cached-reference deep runner: map features extracted once per map stamp.

The production PoseNode deep backend (``make_cached_deep_runner``) must
extract map features only when the map changes (the reference caches SIFT
per orthoimage timestamp, ``core/pose_node.py:124-126,226-241``) and keep
matching the bench-measured cached program per frame.
"""
import jax
import numpy as np
import pytest

from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine
from gisnav_tpu.pipeline import PipelineConfig, init_pipeline_params
from gisnav_tpu.pipeline.runners import make_cached_deep_runner

CFG = PipelineConfig(
    image_shape=(64, 80),
    ortho_shape=(128, 128),
    max_keypoints=64,
    lightglue_depth=1,
    min_matches=4,
)


@pytest.fixture(scope="module")
def runner_inputs():
    rng = np.random.default_rng(3)
    params = init_pipeline_params(jax.random.PRNGKey(0), CFG)
    runner = make_cached_deep_runner(params, CFG)
    query = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    ortho = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    dem = np.zeros((128, 128), np.float32)
    k = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)
    aff = np.asarray(
        pixel_to_wgs84_affine(128, 128, 24.0, 60.0, 24.01, 60.005)
    )
    return runner, params, query, ortho, dem, k, aff


class TestCachedDeepRunner:
    def test_map_extracted_once_per_stamp(self, runner_inputs):
        runner, _, query, ortho, dem, k, aff = runner_inputs
        p1 = runner(query, ortho, dem, 0.0, k, aff, map_stamp=1)
        p2 = runner(query, ortho, dem, 0.0, k, aff, map_stamp=1)
        assert runner.stats == {"frames": 2, "map_extractions": 1}
        # same map + same query -> identical matching result
        np.testing.assert_array_equal(
            np.asarray(p1.matched_ref), np.asarray(p2.matched_ref)
        )

    def test_map_reextracted_on_new_stamp(self, runner_inputs):
        runner, _, query, ortho, dem, k, aff = runner_inputs
        ortho2 = np.roll(ortho, 16, axis=1)
        runner(query, ortho2, dem, 0.0, k, aff, map_stamp=2)
        assert runner.stats["map_extractions"] == 2

    def test_identity_fallback_without_stamp(self, runner_inputs):
        runner, _, query, ortho, dem, k, aff = runner_inputs
        before = runner.stats["map_extractions"]
        runner(query, ortho, dem, 0.0, k, aff)
        runner(query, ortho, dem, 0.0, k, aff)  # same array object
        assert runner.stats["map_extractions"] == before + 1

    def test_output_shape_and_finiteness(self, runner_inputs):
        runner, _, query, ortho, dem, k, aff = runner_inputs
        pose = runner(query, ortho, dem, 0.0, k, aff, map_stamp=9)
        assert np.asarray(pose.ecef_position).shape == (3,)
        assert np.asarray(pose.m_crop).shape == (3, 3)
        # cached mode reports matches in FULL raster coordinates
        np.testing.assert_array_equal(np.asarray(pose.m_crop), np.eye(3))


class TestPoseNodeCachedBackend:
    def test_pose_node_uses_cached_runner(self):
        """PoseNode(backend=deep) wires the cached runner and passes the
        orthoimage stamp through so map features refresh with the map."""
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.gis_node import TOPIC_ORTHOIMAGE
        from gisnav_tpu.nodes.pose_node import PoseNode

        rng = np.random.default_rng(5)
        params = init_pipeline_params(jax.random.PRNGKey(0), CFG)
        runner = make_cached_deep_runner(params, CFG)

        bus = LocalBus()
        node = PoseNode(bus, params={"image_shape": (64, 80)},
                        deep_runner=runner)
        assert node._runner_takes_map_stamp

        k = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)
        bus.publish("/camera/camera_info", {"k": k, "width": 80, "height": 64})
        aff = pixel_to_wgs84_affine(128, 128, 24.0, 60.0, 24.01, 60.005)
        from gisnav_tpu.geometry.crs import affine_to_proj

        ortho = rng.integers(0, 256, (128, 128)).astype(np.uint8)
        msg = {
            "stamp_us": 42,
            "image": ortho,
            "dem": np.zeros((128, 128), np.float32),
            "crs": affine_to_proj(aff),
        }
        bus.publish(TOPIC_ORTHOIMAGE, msg)
        query = rng.integers(0, 256, (64, 80)).astype(np.uint8)
        for stamp in (1_000_000, 2_000_000):
            node.estimate({"stamp_us": stamp, "image": query})
        assert runner.stats["frames"] == 2
        assert runner.stats["map_extractions"] == 1  # same map stamp

        msg2 = dict(msg, stamp_us=43)
        bus.publish(TOPIC_ORTHOIMAGE, msg2)
        node.estimate({"stamp_us": 3_000_000, "image": query})
        assert runner.stats["map_extractions"] == 2


class TestBundledWeightSets:
    def test_load_bundled_both(self):
        from gisnav_tpu.pipeline.runners import (
            LEARNED_LG9_CONFIG,
            PRETRAINED_CONFIG,
            load_bundled,
        )

        p1, c1 = load_bundled("harris_lg5")
        assert c1 is PRETRAINED_CONFIG and "lightglue" in p1
        p2, c2 = load_bundled("learned_lg9")
        assert c2 is LEARNED_LG9_CONFIG
        # learned head present only in the lg9 bundle
        assert "convPa" in str(p2["superpoint"])

    def test_pose_node_weights_param(self):
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.pose_node import PoseNode
        from gisnav_tpu.pipeline.runners import LEARNED_LG9_CONFIG

        node = PoseNode(LocalBus(), params={
            "backend": "deep", "deep_mode": "warp",
            "weights": "learned_lg9"})
        assert node._config is LEARNED_LG9_CONFIG
