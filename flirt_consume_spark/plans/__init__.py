"""Composed end-to-end pipelines (the reference's entry points,
SURVEY.md §3.1) built from the operator library."""

from flirt_consume_spark.plans.consume import (  # noqa: F401
    consume_schedules,
    synth_airports,
    synth_schedules,
)
