from .job import CdcJob
from .runner import CdcStreamRunner, StreamMetrics

__all__ = ["CdcJob", "CdcStreamRunner", "StreamMetrics"]
