"""gisnav_tpu — TPU-native map-based visual navigation framework.

A brand-new JAX/XLA/Pallas implementation of GNSS-free global positioning for
airborne drones: nadir camera frames are matched against orthoimagery + DEM
rasters retrieved from an onboard GIS (WMS) server, PnP is solved for a global
geopose, fused with visual odometry in an (U)KF, and published back to the
autopilot as a mock GPS (uORB / NMEA / UBX).

Capability parity target: hmakelin/gisnav v0.68.1 (see SURVEY.md). The
reference's five-process DDS hot path (StereoNode -> PoseNode -> ...) collapses
here into ONE jitted device program (preprocess -> extract -> match ->
RANSAC-PnP -> geopose); host-side code handles GIS retrieval, transform-graph
bookkeeping and autopilot I/O.

Subpackages
-----------
- ``geometry``  — quaternions, SE(3), CRS math (WGS84/ECEF/ENU/UTM), affine codec
- ``raster``    — device raster preprocessing (fused rotate+crop+normalize)
- ``features``  — SuperPoint keypoint network (Flax) + NMS/top-k
- ``matching``  — LightGlue attention matcher (JAX) + classical MNN/ratio matcher
- ``pnp``       — batched RANSAC-EPnP pose solver + DEM z-lookup
- ``pipeline``  — the single jitted frame->geopose program; benchmarking
- ``fusion``    — JAX EKF/UKF state fusion (robot_localization equivalent)
- ``gis``       — host-side WMS client, bbox logic, overlap-gated map cache
- ``io``        — NMEA / UBX / uORB mock-GPS encoders (pure, unit-testable)
- ``nodes``     — the node graph (bus transport + nodes mirroring reference topics)
- ``parallel``  — device-mesh utilities (multi-stream batching over ICI)
- ``train``     — self-supervised training steps for the feature/matcher nets
"""

__version__ = "0.1.0"

from gisnav_tpu import constants  # noqa: F401
