"""Multi-stream scale-out: N camera feeds in one device program.

BASELINE.json config 5: batch concurrent camera streams (e.g. 8 feeds on a
v5e-8) into one pjit'd program. Each stream has its own query frame, cached
reference feature set, DEM, intrinsics and CRS affine; the batch axis shards
over the mesh's ``data`` axis so every stream's whole frame->geopose program
runs on its own device group with zero cross-device chatter (weights are
replicated or ``model``-sharded; XLA inserts any needed collectives).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gisnav_tpu.pipeline.geopose import (
    GeoPose,
    PipelineConfig,
    build_frame_to_geopose_cached,
)

__all__ = ["build_multistream_pipeline", "shard_stream_batch"]


def build_multistream_pipeline(config: PipelineConfig) -> Callable[..., GeoPose]:
    """vmap the cached-reference pipeline over a leading stream axis.

    Returned signature::

        fn(params, queries, ref_feats, dems, ks, crs_affines, keys) -> GeoPose

    where every array gains a leading ``(n_streams,)`` axis (``params`` stays
    shared) and the result is a batched :class:`GeoPose`.
    """
    frame_fn = build_frame_to_geopose_cached(config)

    def fn(params, queries, ref_feats, dems, ks, crs_affines, keys):
        return jax.vmap(
            lambda q, rf, d, k, aff, key: frame_fn(
                params, q, rf, d, k, aff, key
            )
        )(queries, ref_feats, dems, ks, crs_affines, keys)

    return fn


def shard_stream_batch(mesh, batch_tree):
    """Place a stream-batched pytree with the leading axis over ``data``."""
    sharding = NamedSharding(mesh, P("data"))

    def place(a):
        return jax.device_put(a, sharding)

    return jax.tree.map(place, batch_tree)
