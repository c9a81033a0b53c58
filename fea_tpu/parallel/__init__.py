from .distributed import (
    ensure_initialized,
    is_main_process,
    process_count,
    process_index,
    sync_processes,
)
from .mesh import batch_sharding, make_mesh, replicated_sharding

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "ensure_initialized",
    "is_main_process",
    "process_count",
    "process_index",
    "sync_processes",
]
