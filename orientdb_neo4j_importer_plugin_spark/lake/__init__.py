from .table import CommitConflictError, ConcurrentCommitError, SnapshotTable

__all__ = ["SnapshotTable", "ConcurrentCommitError", "CommitConflictError"]
