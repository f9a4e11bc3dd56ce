"""Beyond-reference analytics operators, designed for 100 TB scale.

The reference's user surface stops at predicate search + count
(SURVEY.md §2: "no SQL, no joins, no aggregations beyond count"); its
own example notebook does means/moving-averages/group-bys in plain
Python (reference examples/2_analytics_workflow.ipynb). These modules
provide that layer — plus the training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) — as declarative
DataFrame transforms that Catalyst can optimize end-to-end.
"""

from . import (  # noqa: F401
    aggregates,
    dedup,
    multimodal,
    sampling,
    similarity,
    sketches,
    text,
    timeseries,
)

__all__ = [
    "aggregates",
    "dedup",
    "multimodal",
    "sampling",
    "similarity",
    "sketches",
    "text",
    "timeseries",
]
