"""On-device pose estimation: batched RANSAC-PnP + DEM elevation gather."""
from gisnav_tpu.pnp.dem import gather_elevation, keypoints_to_3d  # noqa: F401
from gisnav_tpu.pnp.ransac import (  # noqa: F401
    PnPResult,
    project_points,
    ransac_pnp,
)
