from .primitives import (  # noqa: F401
    weighted_bce_with_logits_loss,
    focal_with_logits_loss,
    dice_loss,
    l1_loss,
    l2_loss,
    wahr_loss,
    cross_entropy_with_logits_loss,
)
from .adaptive_scaling import (  # noqa: F401
    AdaptiveScalingRoughLossConfig,
    AdaptiveScalingPreciseLossConfig,
    CoreBox,
    rough_loss,
    precise_loss,
    get_label_point_feature,
)
