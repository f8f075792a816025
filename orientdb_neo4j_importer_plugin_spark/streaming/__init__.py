from .cdf_source import LakeCdfDataSource
from .job import CdcJob
from .runner import CdcStreamRunner, StreamMetrics

__all__ = ["CdcJob", "CdcStreamRunner", "LakeCdfDataSource", "StreamMetrics"]
