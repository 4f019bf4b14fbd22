"""dataflows_spark — a PySpark-native analytics & streaming engine with
the query/data-processing capabilities of datahq/dataflows.

Built from scratch on the public Spark DataFrame / Structured Streaming
APIs (NOT a port): the reference's row-at-a-time generator chain becomes
Catalyst logical plans; its processors become composable stages over
named DataFrames; its checkpoint/upsert machinery becomes Structured
Streaming checkpoints and idempotent keyed sinks.
"""

from .core import Context, Flow, ProcessorError, Stage, TablePackage, build_session, ensure_shipped

# load the submodules BEFORE the star import: the `sources` OPERATOR
# (reference processors/sources.py) shares its name with the `sources/`
# submodule; importing the submodule here pins it in sys.modules so later
# `import dataflows_spark.sources.clips` does not rebind (shadow) the
# operator on this package
from . import functions, sources as _sources_module, streaming  # noqa: F401
from . import operators as ops
from .operators import *  # noqa: F401,F403 — re-export the processor inventory

__version__ = "0.1.0"
