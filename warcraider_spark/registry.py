"""Query registry: the single source of truth for the declared query surface.

Every operator from SURVEY.md §2 is declared here as a ``QuerySpec``:
a named builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent DuckDB oracle SQL string. ``__spark_entry__.py``, tests/ and
bench.py all read this registry, so an operator is "done" exactly when its
spec exists and hash-matches the oracle.

Determinism rules for oracle hashing (SURVEY §7 "What's hard" #5):
- alias every computed column identically in Spark and SQL;
- round floating aggregates (ROUND_DIGITS) on BOTH sides — double summation
  order differs between engines;
- return DATE/STRING rather than raw TIMESTAMP where feasible;
- sort map keys / arrays when emitted as values.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "query", "REGISTRY", "get", "all_specs", "names"]

ROUND_DIGITS = 2

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → driver runs a rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    # Minimum result rows at ANY verify SF. Set to 1 for queries whose
    # discriminating branch (anti-join, NOT EXISTS, rare-event filter)
    # could otherwise pass vacuously as empty-vs-empty (ADVICE r2 #1).
    min_rows: int = 0


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: Iterable[str] = (),
    bench: bool = False,
    min_rows: int = 0,
) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            description=description or ((fn.__doc__ or "").strip().splitlines() or [""])[0],
            tags=tuple(tags),
            bench=bench,
            min_rows=min_rows,
        )
        return fn

    return deco


def get(name: str) -> QuerySpec:
    return REGISTRY[name]


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(REGISTRY)


def names() -> list[str]:
    return sorted(all_specs())


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from warcraider_spark.operators import (  # noqa: F401
        curation,
        dedup,
        extraction,
        graph,
        multimodal,
        pipeline_query,
        relational,
        similarity,
        sketches,
        text,
        udtf_ops,
        windows_events,
    )

    _LOADED = True
