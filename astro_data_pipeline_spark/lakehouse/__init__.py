from .table import CommitConflictError, LakeTable, Snapshot

__all__ = ["CommitConflictError", "LakeTable", "Snapshot"]
