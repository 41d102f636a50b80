"""The fused frame->geopose device program and its configuration."""
from gisnav_tpu.pipeline.geopose import (  # noqa: F401
    GeoPose,
    PipelineConfig,
    build_frame_to_geopose,
    init_pipeline_params,
)
