from .engine import (  # noqa: F401
    AdaptiveScalingInferenceConfig,
    AdaptiveScalingInference,
    RoughInferResult,
    PreciseInferResult,
)
from .batch import BatchedAdaptiveScalingInference  # noqa: F401
from .flatten import (  # noqa: F401
    TextRegionFlattener,
    FlattenedTextRegion,
    stack_flattened_text_regions,
)
from .eval import (  # noqa: F401
    DetectionMetrics,
    evaluate_char_detection,
    evaluate_rough_mask,
    match_polygons,
    polygon_iou,
)
