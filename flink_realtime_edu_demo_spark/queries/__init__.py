"""Query modules — importing this package populates the registry.

Each module covers one SURVEY.md §2 section; each registered function is
a pure ``(spark, sf_dir) -> DataFrame`` so it composes in both batch and
streaming plans.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "aggregates",
    "relational",
    "scalar_fns",
    "joins",
    "window_fns",
    "setops",
    "streaming_batch",
    "timeseries",
    "llm",
    "llm2",
    "llm3",
    "llm4",
    "udfs",
    "analytics",
    "analytics2",
)


def load_all() -> None:
    for m in _MODULES:
        import_module(f"{__name__}.{m}")
    from ..multimodal import register_perceptual_query, register_queries

    register_queries()
    register_perceptual_query()


load_all()
