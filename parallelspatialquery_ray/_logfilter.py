"""Targeted filter for Ray Data's empty-schema RefBundle warning.

Ray 2.49's ``sort`` materializes empty range partitions as zero-row blocks
with an EMPTY schema, and downstream ``map_batches`` UDFs are never invoked
on them (measured; see ``stages/shuffle.py``'s module docstring), so they
cannot be normalized in user code and the streaming executor logs a
WARNING per dead bundle ("... new schema: .").  The engine handles those
blocks by design — every raw-block consumer filters through
``shuffle.live_tables`` and every post-sort reducer passes dead blocks
through — so the warning is pure noise for this engine's pipelines.  The
filter below drops ONLY the empty-schema variant (an empty pyarrow schema
``str()``s to "", giving the exact tail matched here;
ray/data/_internal/execution/streaming_executor_state.py:794).  Genuine
schema divergences format a non-empty field list and still warn.

Kept free of ray imports so ``parallelspatialquery_ray/__init__`` can
install it without paying the ray import at package-import time.
"""

from __future__ import annotations

import logging

# The arrow-block variant (an empty pyarrow schema str()s to "") and the
# pandas-block variant of the same dead bundle.
_DEAD_BLOCK_WARNINGS = (
    "new schema: . This may lead to unexpected behavior.",
    "new schema: PandasBlockSchema(names=[], types=[]). This may lead",
)

_RAY_DATA_EXECUTOR_LOGGER = (
    "ray.data._internal.execution.streaming_executor_state")


class _DeadBlockSchemaFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not any(w in msg for w in _DEAD_BLOCK_WARNINGS)


def install_dead_block_warning_filter() -> None:
    """Idempotently attach the dead-block filter to the Ray Data logger
    that emits the empty-schema divergence warning (driver-side only: the
    streaming executor runs on the driver).

    The filter is process-global (it cannot distinguish engine pipelines
    from other Ray Data pipelines in the same process), so set
    ``PSQ_RAY_KEEP_DEAD_BLOCK_WARNINGS=1`` before import — or call
    :func:`uninstall_dead_block_warning_filter` — if those warnings
    matter for non-engine pipelines you run alongside."""
    import os
    if os.environ.get("PSQ_RAY_KEEP_DEAD_BLOCK_WARNINGS"):
        return
    lg = logging.getLogger(_RAY_DATA_EXECUTOR_LOGGER)
    if not any(isinstance(f, _DeadBlockSchemaFilter) for f in lg.filters):
        lg.addFilter(_DeadBlockSchemaFilter())


def uninstall_dead_block_warning_filter() -> None:
    """Remove the filter (restores Ray Data's stock warning behavior for
    every pipeline in the process)."""
    lg = logging.getLogger(_RAY_DATA_EXECUTOR_LOGGER)
    for f in list(lg.filters):
        if isinstance(f, _DeadBlockSchemaFilter):
            lg.removeFilter(f)
