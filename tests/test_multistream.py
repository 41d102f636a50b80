"""Multi-stream pipeline: 8 camera feeds sharded over an 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine
from gisnav_tpu.parallel import make_mesh
from gisnav_tpu.pipeline import (
    PipelineConfig,
    build_reference_extractor,
    init_pipeline_params,
)
from gisnav_tpu.pipeline.multistream import (
    build_multistream_pipeline,
    shard_stream_batch,
)

CFG = PipelineConfig(
    image_shape=(64, 80),
    ortho_shape=(128, 128),
    max_keypoints=64,
    lightglue_depth=1,
    min_matches=4,
)


def _batch(n, rng):
    params = init_pipeline_params(jax.random.PRNGKey(0), CFG)
    extract = jax.jit(build_reference_extractor(CFG))
    orthos = jnp.asarray(
        rng.uniform(0, 1, (n, 128, 128)).astype(np.float32)
    )
    ref_feats = jax.vmap(lambda o: extract(params, o))(orthos)
    queries = jnp.asarray(rng.uniform(0, 1, (n, 64, 80)).astype(np.float32))
    dems = jnp.zeros((n, 128, 128), jnp.float32)
    k = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)
    ks = jnp.broadcast_to(jnp.asarray(k), (n, 3, 3))
    aff = pixel_to_wgs84_affine(128, 128, 24.0, 60.0, 24.01, 60.005)
    affs = jnp.broadcast_to(jnp.asarray(aff, jnp.float32), (n, 4, 4))
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    return params, (queries, ref_feats, dems, ks, affs, keys)


class TestMultistream:
    def test_vmapped_batch_runs(self, rng):
        params, batch = _batch(4, rng)
        fn = jax.jit(build_multistream_pipeline(CFG))
        out = fn(params, *batch)
        assert out.ecef_position.shape == (4, 3)
        assert out.num_matches.shape == (4,)
        # invalid poses (random weights) may carry NaN; valid ones are finite
        valid = np.asarray(out.valid)
        lla = np.asarray(out.lon_lat_alt)
        assert np.isfinite(lla[valid]).all()

    def test_sharded_over_data_axis(self, rng):
        mesh = make_mesh(8)
        params, batch = _batch(8, rng)
        batch = shard_stream_batch(mesh, batch)
        fn = jax.jit(build_multistream_pipeline(CFG))
        out = fn(params, *batch)
        jax.block_until_ready(out)
        assert out.ecef_position.shape == (8, 3)
        # output inherits the stream sharding
        assert "data" in str(out.ecef_position.sharding) or (
            len(out.ecef_position.sharding.device_set) == 8
        )
