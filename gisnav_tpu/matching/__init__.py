"""Feature matching: LightGlue attention matcher + classical MNN/ratio matcher."""
from gisnav_tpu.matching.loftr import LoFTR, LoFTRMatches  # noqa: F401
from gisnav_tpu.matching.lightglue import (  # noqa: F401
    LightGlue,
    MatchResult,
    match_features,
)
from gisnav_tpu.matching.mnn import mnn_ratio_match, root_sift  # noqa: F401
