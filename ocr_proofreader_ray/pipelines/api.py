"""User-extension surface: the ``Stage`` protocol and ``Pipeline`` builder
(SURVEY.md §2, "User-extension surface").

The reference's mental model is "a pipeline of passes over a book"; the
Ray-native analogue is a declared chain of batch transforms over a Dataset.
A ``Stage`` is a named unit with a declared Arrow schema contract and either

* a pure batch function (``fn``) — scheduled as elastic Ray tasks, or
* a callable class (``actor_cls``) — scheduled as an actor pool whose
  ``__init__`` runs once per actor (model load, dict load, codec open).

``Pipeline`` chains stages onto a Dataset and validates each stage's
declared ``schema_in`` against the incoming schema at build time, so a
mis-wired pipeline fails fast with a named stage instead of deep inside a
worker.  This is the hook for adding new parsers (e.g. new layout formats)
without touching the engine.

Example::

    upper = Stage("upper", fn=fn, schema_in={"text": pa.string()},
                  schema_out={"text": pa.string()})
    ds = Pipeline([upper]).apply(ds)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data


@dataclass(frozen=True)
class Stage:
    """One named pass over Arrow batches.

    Exactly one of ``fn`` (stateless task stage) or ``actor_cls`` (stateful
    actor-pool stage) must be set.  ``schema_in`` / ``schema_out`` declare
    the columns the stage consumes / produces (a subset contract: extra
    input columns pass through untouched only if the stage preserves them).
    """

    name: str
    fn: Callable[[pa.Table], pa.Table] | None = None
    actor_cls: type | None = None
    actor_args: tuple = ()
    schema_in: dict[str, pa.DataType] = field(default_factory=dict)
    schema_out: dict[str, pa.DataType] = field(default_factory=dict)
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float = 1.0

    def __post_init__(self):
        if (self.fn is None) == (self.actor_cls is None):
            raise ValueError(
                f"stage {self.name!r}: exactly one of fn / actor_cls required")
        if self.actor_cls is not None and self.concurrency is None:
            raise ValueError(
                f"stage {self.name!r}: actor stages must size their pool "
                "(concurrency=N or (min, max))")

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        kwargs: dict[str, Any] = dict(
            batch_format="pyarrow", zero_copy_batch=True,
            num_cpus=self.num_cpus,
        )
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.fn is not None:
            return ds.map_batches(self.fn, **kwargs)
        return ds.map_batches(
            self.actor_cls, fn_constructor_args=self.actor_args,
            concurrency=self.concurrency, **kwargs)


class Pipeline:
    """A validated chain of Stages."""

    def __init__(self, stages: list[Stage]):
        names = [s.name for s in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        self.stages = list(stages)

    def validate(self, schema: "pa.Schema") -> None:
        """Check each stage's declared inputs against the flowing schema."""
        cols: dict[str, pa.DataType] = dict(zip(schema.names, schema.types))
        for s in self.stages:
            for col, typ in s.schema_in.items():
                if col not in cols:
                    raise ValueError(
                        f"stage {s.name!r} needs column {col!r} "
                        f"but upstream provides {sorted(cols)}")
                if typ is not None and cols[col] != typ:
                    raise ValueError(
                        f"stage {s.name!r} needs {col!r}: {typ} "
                        f"but upstream provides {cols[col]}")
            if s.schema_out:
                cols = {c: t for c, t in s.schema_out.items()}
        # final schema implied by the last stage's schema_out

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        schema = ds.schema()
        if schema is not None:
            self.validate(schema.base_schema)
        for s in self.stages:
            ds = s.apply(ds)
        return ds
