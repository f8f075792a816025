from .table import SnapshotTable

__all__ = ["SnapshotTable"]
