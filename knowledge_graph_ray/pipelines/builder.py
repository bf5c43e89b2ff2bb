"""Stage protocol + pipeline builder (SURVEY.md §2.10).

The reference's de-facto extension points (manually swapped embedder /
search backend / reranker) become declared stages: a ``Stage`` names a
transform, says whether it is a stateless task or a stateful actor
pool, and carries its own resources. ``chain`` folds stages over a
Dataset — Ray Data's lazy plan is the IR; this is just the typed
assembly layer.

    pipeline = [
        Stage("extract", fn=extract_batch),
        Stage("segment", fn=paragraphs_batch),
        Stage("link", actor_cls=ExtractLinkActor,
              actor_kwargs={...}, concurrency=8, batch_size=2048),
    ]
    ds = chain(pages, pipeline)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from ray.data import Dataset


@dataclass
class Stage:
    name: str
    fn: Callable | None = None  # stateless task kernel (batch → batch)
    actor_cls: type | None = None  # stateful actor class (exclusive with fn)
    actor_kwargs: dict[str, Any] = field(default_factory=dict)
    batch_format: str = "pyarrow"
    batch_size: int | None = 1024
    concurrency: int | tuple | None = None  # actors only
    num_cpus: float | None = None
    num_gpus: float | None = None

    def apply(self, ds: Dataset) -> Dataset:
        kwargs: dict[str, Any] = {
            "batch_format": self.batch_format,
            "batch_size": self.batch_size,
        }
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        if self.num_gpus is not None:
            kwargs["num_gpus"] = self.num_gpus
        if self.actor_cls is not None:
            kwargs["fn_constructor_kwargs"] = self.actor_kwargs
            kwargs["concurrency"] = self.concurrency or (1, 4)
            return ds.map_batches(self.actor_cls, **kwargs)
        assert self.fn is not None, f"stage {self.name}: fn or actor_cls required"
        return ds.map_batches(self.fn, **kwargs)


def chain(ds: Dataset, stages: list[Stage]) -> Dataset:
    for stage in stages:
        ds = stage.apply(ds)
    return ds
