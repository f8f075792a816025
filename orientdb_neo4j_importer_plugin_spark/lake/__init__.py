# table first: materialize -> cdc.apply -> cdc.replay imports
# lake.SnapshotTable back out of this (then partially initialized) package,
# so the name must already be bound when materialize loads.
from .table import CommitConflictError, ConcurrentCommitError, SnapshotTable
from .materialize import IncrementalView
from .sketchview import StreamedCmsView, StreamedHistView

__all__ = [
    "CommitConflictError",
    "ConcurrentCommitError",
    "IncrementalView",
    "SnapshotTable",
    "StreamedCmsView",
    "StreamedHistView",
]
