from .runner import CdcStreamRunner, StreamMetrics

__all__ = ["CdcStreamRunner", "StreamMetrics"]
