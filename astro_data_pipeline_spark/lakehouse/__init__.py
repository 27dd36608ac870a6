from .matview import AggSpec, IncrementalAggView
from .merge_builder import MergeBuilder
from .replicate import Replicator
from .table import CommitConflictError, LakeTable, Snapshot

__all__ = [
    "AggSpec",
    "CommitConflictError",
    "IncrementalAggView",
    "LakeTable",
    "MergeBuilder",
    "Replicator",
    "Snapshot",
]
