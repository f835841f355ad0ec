"""RabbitMQ-stream adapter seam for the eventstream source.

The reference's source of truth is a RabbitMQ *stream* consumed with an
offset specification (`/root/reference/app/app.py:304-310,564-573`); this
sandbox has no broker, so the engine's tested source is the file-backed log
(`eventstream.py`, sanctioned by SURVEY §1.4). This module is the
production seam: the SAME option surface (`stream`, `startingOrdinal`,
`startingTimestampMs`, `startingDatetime`, mutual exclusion, UTC-pinned
datetime parsing) mapped onto broker offset specs, with connection options
(`host`, `port`, `vhost`, `username`, `password`) replacing `path`.

`offset_spec(options)` is the pure, unit-tested mapping — identical seek
semantics to `eventstream._seek_start`, returning the broker-level spec:

    ("next", None)            default — only new events (OffsetType.NEXT)
    ("offset", n)             EXCLUSIVE ordinal n → broker offset n (the
                              broker's 0-based inclusive offset n means
                              "first delivered ordinal is n+1", which is
                              the README's exclusive contract)
    ("timestamp", ms)         broker-timestamp seek, milliseconds

The DataSource itself requires a RabbitMQ stream client library
(``rstream``); in environments without it, constructing a reader raises
ImportError with a pointer at the file-backed source. No network code runs
at import time, so registering the source is always safe.
"""

from __future__ import annotations

from datetime import datetime, timezone

try:  # pragma: no cover - exercised only where pyspark DS API is present
    from pyspark.sql.datasource import DataSource, DataSourceStreamReader
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]

from .eventstream import ENVELOPE, SEEK_OPTIONS, _opt

CONNECTION_OPTIONS = ("host", "port", "vhost", "username", "password")


def offset_spec(options: dict) -> tuple[str, int | None]:
    """Resolve seek options to a broker offset specification.

    Same contract as the file source (mutual exclusion → ValueError with
    the reference's wire message; tz-less datetimes are UTC).
    """
    given = [k for k in SEEK_OPTIONS if _opt(options, k) is not None]
    if len(given) > 1:
        raise ValueError(
            "Cannot provide more than one 'stream_from_' variable: " + ", ".join(given)
        )
    if not given:
        return ("next", None)
    if given[0] == "startingOrdinal":
        return ("offset", int(_opt(options, "startingOrdinal")))
    if given[0] == "startingTimestampMs":
        return ("timestamp", int(_opt(options, "startingTimestampMs")))
    dt = datetime.fromisoformat(str(_opt(options, "startingDatetime")))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return ("timestamp", int(dt.timestamp() * 1000))


def connection_params(options: dict) -> dict:
    """Extract + default the broker connection parameters."""
    if not _opt(options, "stream"):
        raise ValueError("rabbitmq-eventstream requires a 'stream' option")
    return {
        "host": _opt(options, "host") or "localhost",
        "port": int(_opt(options, "port") or 5552),
        "vhost": _opt(options, "vhost") or "/",
        "username": _opt(options, "username") or "guest",
        "password": _opt(options, "password") or "guest",
        "stream": _opt(options, "stream"),
    }


class RabbitMQStreamDataSource(DataSource):
    """``spark.readStream.format("rabbitmq-eventstream")`` — same envelope
    schema as the file-backed source, so downstream relay/aggregation code
    is source-agnostic."""

    @classmethod
    def name(cls) -> str:
        return "rabbitmq-eventstream"

    def schema(self):
        return ENVELOPE

    def streamReader(self, schema) -> "DataSourceStreamReader":
        params = connection_params(self.options)
        spec = offset_spec(self.options)
        try:
            import rstream  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no broker lib here
            raise ImportError(
                "rabbitmq-eventstream needs the 'rstream' client library, "
                "which is not installed in this environment. Use the "
                "file-backed 'eventstream' source (same options minus "
                f"host/vhost) for local/offline runs. Resolved connection: "
                f"{params['host']}:{params['port']}{params['vhost']} "
                f"stream={params['stream']}, offset spec={spec}."
            ) from exc
        raise NotImplementedError(  # pragma: no cover - requires a broker
            "broker-backed reader: subscribe with rstream.Consumer("
            "host/port/vhost/credentials), offset specification from "
            "offset_spec(), and yield (key, value, offset, timestamp) "
            "batches — the envelope contract of eventstream.ENVELOPE"
        )
