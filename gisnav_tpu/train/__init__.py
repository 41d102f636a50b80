"""Self-supervised training for the extractor/matcher networks."""
from gisnav_tpu.train.data import make_homography_batch  # noqa: F401
from gisnav_tpu.train.steps import (  # noqa: F401
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_step,
    matcher_loss,
)
