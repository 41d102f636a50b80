"""State fusion: JAX EKF replacing the robot_localization dependency."""
from gisnav_tpu.fusion.ekf import (  # noqa: F401
    EKFState,
    ekf_init,
    ekf_predict,
    ekf_update_pose,
    ekf_update_velocity,
)
from gisnav_tpu.fusion.filter import PoseFusionFilter  # noqa: F401
