"""Sinks: B14 file (operators.batch.write_files), B15 Kafka, B16 webhook."""

from .kafka_sink import write_kafka
from .webhook_sink import webhook_foreach_batch

__all__ = ["write_kafka", "webhook_foreach_batch"]
