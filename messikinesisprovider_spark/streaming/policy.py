"""Flow-control policy: the reference's polling/backoff constants as config.

Maps the hard-coded operational constants (BASELINE.md table a) onto the
Spark-native knobs so a deployment can state its flow-control intent in the
reference's vocabulary and get the right trigger + source options:

- poll interval 1000 ms (KinesisMessiClientFactory.java:64)  → ProcessingTime trigger
- fetch limit 1000/request (KinesisStreamingBuffer.java:41)  → maxrecordspershard
- rate-limit backoff 3× poll (KinesisStreamingBuffer.java:133) → retry delay
- error retry 1× poll (:125,139,146)                          → retry delay
- catch-up mode (millisBehindLatest > 0 ⇒ immediate refetch)  → AvailableNow backfill
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PollPolicy:
    poll_interval_ms: int = 1000  # KinesisMessiClientFactory.java:64
    fetch_limit: int = 1000  # KinesisStreamingBuffer.java:41
    rate_limit_backoff_factor: int = 3  # KinesisStreamingBuffer.java:133
    error_retry_factor: int = 1  # KinesisStreamingBuffer.java:125,139,146

    @property
    def rate_limit_backoff_ms(self) -> int:
        return self.rate_limit_backoff_factor * self.poll_interval_ms

    @property
    def error_retry_ms(self) -> int:
        return self.error_retry_factor * self.poll_interval_ms

    def trigger(self, backfill: bool = False) -> dict:
        """kwargs for DataStreamWriter.trigger(): steady-state polling vs
        catch-up backfill (the adaptive-scheduling split F3)."""
        if backfill:
            return {"availableNow": True}
        return {"processingTime": f"{self.poll_interval_ms} milliseconds"}

    def source_options(self) -> dict:
        return {"maxrecordspershard": str(self.fetch_limit)}


REFERENCE_POLICY = PollPolicy()
