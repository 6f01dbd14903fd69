"""Sliding-window running-mean metrics (reference training/metrics.py:19-54):
per-tag bounded queue of the last ``avg_num_batches`` values with O(1)
update. Tags may be any hashable (the reference uses an Enum)."""
from __future__ import annotations

from collections import deque
from typing import Dict, Generic, Hashable, Iterable, Optional, Sequence, TypeVar

_T = TypeVar("_T", bound=Hashable)


class Metrics(Generic[_T]):
    def __init__(self, tags: Iterable[_T], avg_num_batches: int):
        self.tags = tuple(tags)
        self.avg_num_batches = avg_num_batches
        self.tag_to_queue: Dict[_T, deque] = {}
        self.tag_to_avg_value: Dict[_T, Optional[float]] = {}
        self.reset()

    def reset(self, tags: Optional[Sequence[_T]] = None) -> None:
        for tag in self.tags if tags is None else tags:
            self.tag_to_queue[tag] = deque()
            self.tag_to_avg_value[tag] = None

    def update(self, tag: _T, value: float) -> float:
        queue = self.tag_to_queue[tag]
        avg = self.tag_to_avg_value[tag]
        size = len(queue)
        if size == 0:
            new_avg = value
        elif size < self.avg_num_batches:
            assert avg is not None
            new_avg = (avg * size + value) / (size + 1)
        else:
            assert avg is not None
            popped = queue.popleft()
            new_avg = avg + (value - popped) / size
        queue.append(value)
        self.tag_to_avg_value[tag] = new_avg
        return new_avg
