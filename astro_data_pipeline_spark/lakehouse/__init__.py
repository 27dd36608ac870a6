from .matview import AggSpec, IncrementalAggView
from .table import CommitConflictError, LakeTable, Snapshot

__all__ = [
    "AggSpec",
    "CommitConflictError",
    "IncrementalAggView",
    "LakeTable",
    "Snapshot",
]
