from .context import Context, build_session, ensure_shipped
from .errors import ProcessorError, SchemaError
from .flow import DataFrameStage, Flow, FuncStage, IterableStage, Stage
from .package import TablePackage

__all__ = [
    "Context",
    "DataFrameStage",
    "Flow",
    "FuncStage",
    "IterableStage",
    "ProcessorError",
    "SchemaError",
    "Stage",
    "TablePackage",
    "build_session",
    "ensure_shipped",
]
