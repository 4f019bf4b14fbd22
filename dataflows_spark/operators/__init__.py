"""All pipeline stages — the full processor inventory of the reference
(``dataflows/processors/__init__.py:1-33``) re-expressed Spark-first,
plus engine extensions (streaming, training-data ops)."""

from .dump import checkpoint, dump_to_path, dump_to_sql, dump_to_zip, stream
from .fields import (
    add_computed_field,
    add_field,
    delete_fields,
    rename_fields,
    select_fields,
)
from .join import join, join_with_self
from .load import load, sources, unstream
from .meta import (
    add_metadata,
    conditional,
    finalizer,
    parallelize,
    printer,
    set_primary_key,
    update_package,
    update_resource,
    update_schema,
    update_stats,
)
from .reshape import (
    concatenate,
    deduplicate,
    delete_resource,
    duplicate,
    sort_rows,
    unpivot,
)
from .transforms import filter_rows, find_replace, set_type, validate
from .udf import row_mapper, rows_transform

__all__ = [
    "add_computed_field",
    "add_field",
    "add_metadata",
    "checkpoint",
    "concatenate",
    "conditional",
    "deduplicate",
    "delete_fields",
    "delete_resource",
    "dump_to_path",
    "dump_to_sql",
    "dump_to_zip",
    "duplicate",
    "filter_rows",
    "finalizer",
    "find_replace",
    "join",
    "join_with_self",
    "load",
    "parallelize",
    "printer",
    "rename_fields",
    "row_mapper",
    "rows_transform",
    "select_fields",
    "set_primary_key",
    "set_type",
    "sort_rows",
    "sources",
    "stream",
    "unpivot",
    "unstream",
    "update_package",
    "update_resource",
    "update_schema",
    "update_stats",
    "validate",
]
