"""Job-control wrapper around CdcStreamRunner — the HTTP-plugin job handle
analogue.

Reference analogues:

* ``ONeo4jImporterJob.run`` lifecycle STARTED -> RUNNING -> FINISHED
  (``ONeo4jImporterJob.java:74,102``; enum ``:161-165``);
* log captured to a buffer for polling (``:51-52,138-159``);
* ``status()`` JSON {cfg, status, log} served by GET /neo4j-importer/status
  (``OServerCommandNeo4jImporter.java:34-52``;
  ``ONeo4jImporterHandler.java:45-62``).

Spark-first: the async executor is the StreamingQuery itself (micro-batches
run off-thread), so no thread pool is needed; stop() maps to query.stop().
"""

from __future__ import annotations

import io
import logging
import time
from typing import Any

from .runner import CdcStreamRunner

logger = logging.getLogger("orientdb_neo4j_importer_plugin_spark.streaming")


class CdcJob:
    """One controllable ingest job: start() returns immediately (the query
    runs asynchronously), status() is poll-able, stop() terminates."""

    def __init__(self, runner: CdcStreamRunner):
        self.runner = runner
        self.query = None
        self._log_buf = io.StringIO()
        self._handler = logging.StreamHandler(self._log_buf)
        self._handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        self._started_at: float | None = None
        self._finished_at: float | None = None

    # -- lifecycle ------------------------------------------------------------

    def start(self, available_now: bool = True) -> "CdcJob":
        if self.query is not None:
            raise RuntimeError("job already started")
        logger.addHandler(self._handler)
        logger.setLevel(logging.INFO)
        self._started_at = time.time()
        logger.info(
            "job STARTED feed=%s table=%s mode=%s",
            self.runner.feed_dir,
            self.runner.table.root,
            self.runner.mode,
        )
        self.query = self.runner.start(available_now=available_now)
        return self

    def await_completion(self, timeout_sec: float | None = None) -> dict[str, Any]:
        if self.query is None:
            raise RuntimeError("job not started")
        self.query.awaitTermination(timeout_sec)
        if self.query.isActive:
            self.stop()
        else:
            self._finish()
        return self.status()

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()
            self.query.awaitTermination(30)
        self._finish()

    def _finish(self) -> None:
        if self._finished_at is None:
            self._finished_at = time.time()
            self.runner.metrics.status = "FINISHED"
            logger.info(
                "job FINISHED batches=%d events=%d",
                self.runner.metrics.batches,
                self.runner.metrics.events_in,
            )
            logger.removeHandler(self._handler)

    # -- polling surface --------------------------------------------------------

    def log(self) -> str:
        """Captured job log (the ByteArrayOutputStream polling analogue)."""
        return self._log_buf.getvalue()

    def status(self) -> dict[str, Any]:
        """{cfg, status, metrics, log} — the GET /status JSON analogue."""
        m = self.runner.metrics
        state = m.status
        if self.query is not None and self._finished_at is None:
            state = "RUNNING" if self.query.isActive else m.status
        return {
            "cfg": {
                "feed_dir": self.runner.feed_dir,
                "table": self.runner.table.root,
                "checkpoint_dir": self.runner.checkpoint_dir,
                "mode": self.runner.mode,
                "compact_every": self.runner.compact_every,
                "quarantine": self.runner.quarantine,
            },
            "status": state,
            "metrics": m.to_json(),
            "started_at": self._started_at,
            "finished_at": self._finished_at,
            "log": self.log(),
        }
