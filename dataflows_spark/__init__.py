"""dataflows_spark — a PySpark-native analytics & streaming engine with
the query/data-processing capabilities of datahq/dataflows.

Built from scratch on the public Spark DataFrame / Structured Streaming
APIs (NOT a port): the reference's row-at-a-time generator chain becomes
Catalyst logical plans; its processors become composable stages over
named DataFrames; its checkpoint/upsert machinery becomes Structured
Streaming checkpoints and idempotent keyed sinks.
"""

from .core import Context, Flow, ProcessorError, Stage, TablePackage, build_session
from . import operators as ops
from .operators import *  # noqa: F401,F403 — re-export the processor inventory

__version__ = "0.1.0"
