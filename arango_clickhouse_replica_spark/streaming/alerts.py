"""Failure alerting for streaming queries (C7 analogue).

The reference emails on replication failure (``alert/mailer.py:11-63``,
gated by an ``enabled`` config flag). On Spark the equivalent hook is a
``StreamingQueryListener``: every query termination with an exception
lands as ONE structured JSONL record in a failure log — the dead-letter
pattern applied to the query lifecycle — and optionally fans out to
pluggable notifiers (the SMTP transport plugs in exactly where the
reference's ``Mailer.send`` sat, behind the same enabled gate; no mail
server exists in this sandbox, so the transport is injectable and the
disabled path returns False just like ``mailer.py:26-27``).

Why a log first, notifiers second: at 1000 executors a flapping sink can
terminate dozens of queries per minute — the durable record is what the
operator greps and what resync tooling consumes; notification is a view
over it, rate-limited at the notifier, never a prerequisite for capture.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql.streaming import StreamingQueryListener

FailureNotifier = Callable[[dict], object]


class FailureLog:
    """Append-only JSONL failure records, one line per event; thread-safe
    (listener callbacks arrive on Spark's listener bus thread)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, record: dict) -> None:
        with self._lock:
            with open(self.path, "a", encoding="utf-8") as f:
                f.write(json.dumps(record, separators=(",", ":")) + "\n")
                f.flush()

    def records(self) -> list[dict]:
        try:
            with open(self.path, "r", encoding="utf-8") as f:
                return [json.loads(line) for line in f if line.strip()]
        except FileNotFoundError:
            return []


class ReplicationQueryListener(StreamingQueryListener):
    """Writes a structured record for every query termination; failures
    (terminations carrying an exception) additionally fan out to the
    registered notifiers. Register via ``spark.streams.addListener``
    (done by :func:`attach_alerts`)."""

    def __init__(
        self,
        failure_log: FailureLog,
        notifiers: Optional[list[FailureNotifier]] = None,
    ) -> None:
        self.failure_log = failure_log
        self.notifiers = list(notifiers or [])

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        record = {
            "event": "query_terminated",
            "query_id": str(event.id),
            "run_id": str(event.runId),
            "exception": event.exception,  # None on clean stop
            "failed": event.exception is not None,
        }
        self.failure_log.append(record)
        if record["failed"]:
            for notify in self.notifiers:
                try:
                    notify(record)
                except Exception:  # a broken notifier must never mask capture
                    pass


def attach_alerts(
    spark,
    log_path: str,
    notifiers: Optional[list[FailureNotifier]] = None,
) -> ReplicationQueryListener:
    """Register the failure listener on the session; returns it (keep the
    reference to ``spark.streams.removeListener`` later)."""
    listener = ReplicationQueryListener(FailureLog(log_path), notifiers)
    spark.streams.addListener(listener)
    return listener


# ---------------------------------------------------------------------------
# SMTP notifier (the reference's Mailer, reduced to its contract)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MailConfig:
    """mailer.py:8 — ``enabled`` gates everything; disabled sends return
    False without touching the network."""

    host: str = ""
    port: int = 25
    username: str = ""
    password: str = ""
    sender: str = "replication@localhost"
    to: tuple = ()
    enabled: bool = False


def smtp_notifier(config: MailConfig, transport: Optional[Callable] = None):
    """Build a FailureNotifier that mails the failure record.

    ``transport(config, subject, body)`` is injectable for tests;
    production default opens smtplib.SMTP + STARTTLS like the reference
    (mailer.py:17-22). Disabled config -> returns False (mailer.py:26-27).
    """

    def default_transport(cfg: MailConfig, subject: str, body: str):
        import smtplib
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        server = smtplib.SMTP(cfg.host, cfg.port)
        try:
            server.ehlo()
            server.starttls()
            server.ehlo()
            if cfg.username:
                server.login(cfg.username, cfg.password)
            msg = MIMEMultipart("alternative")
            msg["From"] = cfg.sender
            msg["To"] = ", ".join(cfg.to)
            msg["Subject"] = subject
            msg.attach(MIMEText(body, "plain"))
            return server.sendmail(cfg.sender, list(cfg.to), msg.as_string())
        finally:
            server.quit()

    send = transport or default_transport

    def notify(record: dict):
        if not config.enabled:
            return False
        subject = f"replication failure: query {record.get('query_id')}"
        return send(config, subject, json.dumps(record, indent=2))

    return notify
