"""The fused frame->geopose device program and its configuration."""
from gisnav_tpu.pipeline.geopose import (  # noqa: F401
    GeoPose,
    PipelineConfig,
    build_frame_to_geopose,
    build_frame_to_geopose_cached,
    build_reference_extractor,
    init_pipeline_params,
)
