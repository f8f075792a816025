from .cdf_source import LakeCdfDataSource
from .job import CdcJob
from .mirror import MirrorRunner
from .runner import CdcStreamRunner, StreamMetrics

__all__ = [
    "CdcJob",
    "CdcStreamRunner",
    "LakeCdfDataSource",
    "MirrorRunner",
    "StreamMetrics",
]
