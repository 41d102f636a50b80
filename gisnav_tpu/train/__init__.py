"""Self-supervised training for the extractor/matcher networks."""
from gisnav_tpu.train.checkpoint import (  # noqa: F401
    latest_step,
    load_params,
    save_params,
)
from gisnav_tpu.train.data import make_homography_batch  # noqa: F401
from gisnav_tpu.train.loop import train  # noqa: F401
from gisnav_tpu.train.steps import (  # noqa: F401
    TrainConfig,
    TrainState,
    init_train_state,
    make_train_step,
    matcher_loss,
)
