from .resize import (  # noqa: F401
    upsample_nearest,
    resize_nearest,
    resize_bilinear,
    adaptive_avg_pool,
    area_downsample,
    area_resize_weights,
    pad_length_to_make_divisible,
    pad_to_divisible,
)
