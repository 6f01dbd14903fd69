from .geometry import (  # noqa: F401
    Box,
    Polygon,
    mask_to_disconnected_polygons,
    affine_polygons,
    rotate_trans_mat,
)
from .synth import SynthPageConfig, SynthPage, generate_page  # noqa: F401
from .dataset import (  # noqa: F401
    RoughSample,
    PreciseSample,
    CharRegressionLabel,
    AdaptiveScalingDatasetConfig,
    AdaptiveScalingIterableDataset,
    collate_samples,
)
