"""Kafka topic administration for resync (SURVEY §2.9 C4).

The reference's resync flow (``replication/replicator/sync.py:18-72``)
deletes each table's topic, polls the broker until the deletion has
actually propagated (topic deletion is asynchronous in Kafka), then
recreates it with the table's custom topic configs before restarting the
producer. This module reproduces that contract behind an injectable
admin client so the protocol is unit-testable without a broker (the same
environment-gating pattern as ``sources/arango_wal.py``):

- the client is duck-typed (``topics()`` / ``delete_topics(names)`` /
  ``create_topic(name, partitions, rf, configs)``);
- the default client adapts ``kafka.KafkaAdminClient`` (kafka-python)
  and is constructed lazily — importing this module never requires the
  library, and no broker exists in the test environment;
- ``ReplicationManager.resync`` calls ``recreate`` when an admin is
  configured, closing the reference's stop -> delete topic -> create
  topic -> backfill -> restart loop end to end.

Unlike the reference's hardcoded 1 partition (total order per topic —
``sync.py:64``), the partition count is a parameter here: the engine's
version-based merge (M1) is order-insensitive, so topic parallelism can
match source throughput.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence


class KafkaPythonAdminClient:
    """Default client: adapts kafka-python's KafkaAdminClient/KafkaConsumer.

    Constructed lazily; raises ImportError with a clear message if the
    library is absent (it is not shipped in this environment)."""

    def __init__(self, bootstrap_servers: str) -> None:
        try:
            from kafka import KafkaAdminClient, KafkaConsumer  # type: ignore
        except ImportError as e:  # pragma: no cover - env-gated
            raise ImportError(
                "kafka-python is required for live topic administration; "
                "inject a custom admin client for testing"
            ) from e
        self._admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
        self._consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)

    def topics(self) -> set[str]:  # pragma: no cover - env-gated
        return set(self._consumer.topics())

    def delete_topics(self, names: Sequence[str]) -> None:  # pragma: no cover
        self._admin.delete_topics(topics=list(names))

    def create_topic(  # pragma: no cover - env-gated
        self, name: str, partitions: int, replication_factor: int,
        configs: dict | None,
    ) -> None:
        from kafka.admin import NewTopic  # type: ignore

        self._admin.create_topics([
            NewTopic(
                name=name,
                num_partitions=partitions,
                replication_factor=replication_factor,
                topic_configs=configs or {},
            )
        ])


class KafkaTopicAdmin:
    """Topic lifecycle for resync: delete-and-wait, create, recreate."""

    def __init__(
        self,
        client,
        *,
        delete_timeout: float = 10.0,
        poll_interval: float = 0.05,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.client = client
        self.delete_timeout = delete_timeout
        self.poll_interval = poll_interval
        self._sleep = sleep

    def delete_topics(self, topics: Sequence[str]) -> bool:
        """Delete ``topics`` and poll until the broker has actually
        dropped them (deletion is async); True only if every one is gone
        within the timeout — the reference's is_deleted watcher
        (sync.py:29-47) without the thread."""
        active = [t for t in topics if t in self.client.topics()]
        if not active:
            return True
        self.client.delete_topics(active)
        deadline = time.monotonic() + self.delete_timeout
        while time.monotonic() < deadline:
            current = self.client.topics()
            if not any(t in current for t in active):
                return True
            self._sleep(self.poll_interval)
        return not any(t in self.client.topics() for t in active)

    def create_topic(
        self,
        name: str,
        *,
        partitions: int = 1,
        replication_factor: int = 1,
        topic_configs: dict | None = None,
    ) -> bool:
        self.client.create_topic(name, partitions, replication_factor,
                                 topic_configs)
        return True

    def recreate(
        self,
        topics: Sequence[str],
        *,
        partitions: int = 1,
        topic_configs: dict[str, dict] | None = None,
    ) -> bool:
        """The resync hook: drop every topic (waiting out async deletion)
        and recreate it empty — compacted history from the previous epoch
        must not replay into the resynced target."""
        if not self.delete_topics(topics):
            return False
        for t in topics:
            self.create_topic(
                t,
                partitions=partitions,
                topic_configs=(topic_configs or {}).get(t),
            )
        return True
