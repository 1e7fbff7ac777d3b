"""Structured logging + scan counters.

The reference's only observability is PHP warnings and benchmark printf
(``examples/benchmark.php:49,81-84``).  Here: a standard library logger
(``php_aho_corasick_tpu``) and a per-matcher :class:`ScanStats` counter
block surfaced as ``Matcher.stats``.
"""

from __future__ import annotations

import dataclasses
import logging

logger = logging.getLogger("php_aho_corasick_tpu")


@dataclasses.dataclass
class ScanStats:
    """Cumulative per-matcher scan counters."""

    scans: int = 0
    bytes_scanned: int = 0
    matches_emitted: int = 0
    capacity_retries: int = 0
    last_engine: str = ""
    last_backend: str = ""

    def record(self, engine: str, backend: str, n_bytes: int, n_matches: int) -> None:
        self.scans += 1
        self.bytes_scanned += n_bytes
        self.matches_emitted += n_matches
        self.last_engine = engine
        self.last_backend = backend
        logger.debug(
            "scan engine=%s backend=%s bytes=%d matches=%d",
            engine, backend, n_bytes, n_matches,
        )

    def summary(self) -> str:
        return (
            f"{self.scans} scans, {self.bytes_scanned / 2**20:.1f} MiB, "
            f"{self.matches_emitted} matches, last={self.last_engine}/"
            f"{self.last_backend}"
        )
