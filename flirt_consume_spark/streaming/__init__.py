"""Structured Streaming half of the engine (SURVEY.md §2.A S5/S6, §2.I).

The reference is a cron-driven batch consumer of monthly files; the
Spark-first re-expression treats that as the degenerate case of a
file-arrival stream: the same pure DataFrame transforms run under
``spark.read`` (backfill) and ``spark.readStream`` (incremental),
which is exactly the Structured Streaming design (SIGMOD 2018 paper,
PAPERS.md). ``trigger(availableNow=True)`` + checkpoint gives the
reference's idempotent re-consume of a month; ``foreachBatch`` +
dynamic partition overwrite gives its atomic collection swap.
"""

from flirt_consume_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    session_agg,
    sliding_agg,
    stream_dedup,
    stream_static_join,
    tumbling_agg,
    user_running_totals,
    write_monthly_sink,
)
