"""Manual inspection / profiling helpers (not collected by pytest) — the
equivalents of the reference's uncollected test helpers
(tests/test_adaptive_scaling.py:103-377: forward profiling, dataset batch
rendering, dataset latency stats)."""
from .inspect import (
    profile_dataset,
    profile_forward,
    sample_dataset,
)

__all__ = ["profile_dataset", "profile_forward", "sample_dataset"]
