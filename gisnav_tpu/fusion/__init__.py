"""State fusion: JAX EKF replacing the robot_localization dependency."""
from gisnav_tpu.fusion.ekf import (  # noqa: F401
    EKFState,
    ekf_init,
    ekf_predict,
    ekf_update_pose,
    ekf_update_velocity,
)
from gisnav_tpu.fusion.filter import PoseFusionFilter  # noqa: F401
from gisnav_tpu.fusion.ukf import (  # noqa: F401
    ukf_predict,
    ukf_update_pose,
    ukf_update_velocity,
)
