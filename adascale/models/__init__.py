from .convnext import ConvNeXt, ConvNeXtConfig  # noqa: F401
from .fpn import FpnNeck, FpnHead  # noqa: F401
from .upernext import UperNextNeck, UperNextHead, PpmBlock  # noqa: F401
from .adaptive_scaling import (  # noqa: F401
    AdaptiveScaling,
    AdaptiveScalingConfig,
    AdaptiveScalingSize,
    AdaptiveScalingNeckHeadType,
)
