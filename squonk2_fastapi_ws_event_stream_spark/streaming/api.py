"""Control-plane REST API — the reference's internal API surface (C1-C4,
SURVEY §2.8) plus the consume path (C5).

Request/response shapes mirror /root/reference/app/app.py:150-187 exactly:

    GET    /event-stream/version/   → {protocol, name, version}     (C1, :596-603)
    POST   /event-stream/           → 201 {id, location}            (C2, :606-649)
    GET    /event-stream/           → {event_streams: [...]}        (C3, :652-674)
    DELETE /event-stream/<id>       → 204 | 404                     (C4, :677-717)
    GET    /event-stream/<uuid>/consume?stream_from_*               (C5, :193-373)

Transport note: the reference serves C5 over WebSocket (protocol string
"WEBSOCKET", app/app.py:598-603). Real WebSocket transport ships in
`streaming/websocket.py` — an RFC 6455 server on the Python stdlib (this
container has no `websockets`/ASGI package), started alongside this app by
serve.py on its own port, matching the reference's two-listener split
(public WS 8080 / internal REST 8081, docker-entrypoint.sh:8-10). The
HTTP-stream consume below remains as a second transport for bounded
drains; its close codes map to HTTP errors: 1000 unknown-uuid → 404
(app/app.py:287-291), 1002 bad params → 400 (:269-278), 1013 missing
stream → 503 (:314-318).

Flask (WSGI) is fine here: the heavy lifting is inside Spark; the API layer
only manages StreamingQuery handles — it is control plane, not data plane.
"""

from __future__ import annotations

import json
import queue

from pyspark.sql import SparkSession

from flask import Flask, Response, jsonify, request

from .. import __version__
from ..sources.eventstream import stream_exists
from ..sources.registry import Registry
from .manager import StreamManager

# Native RFC 6455 server (streaming/websocket.py) serves C5 — same protocol
# string as the reference (app/app.py:598-603).
PROTOCOL = "WEBSOCKET"
NAME = "PySpark Structured Streaming"


def _location(base_url: str, uuid: str) -> str:
    # _get_location analog (app/app.py:104-108)
    return f"{base_url.rstrip('/')}/event-stream/{uuid}"


def create_app(
    spark: SparkSession, registry: Registry, manager: StreamManager
) -> Flask:
    app = Flask("squonk2-ws-event-stream-spark")

    @app.get("/event-stream/health/")
    def health():
        """Readiness/liveness analog of the reference's probe scripts
        (probes/readiness.sh, probes/liveness.sh): reports Spark session
        liveness and the per-stream consumer states."""
        try:
            spark.sql("SELECT 1").collect()
            spark_ok = True
        except Exception:
            spark_ok = False
        status = 200 if spark_ok else 503
        return jsonify({"spark": spark_ok, "consumers": manager.snapshot()}), status

    @app.get("/event-stream/version/")
    def version():  # C1
        return jsonify(
            {"protocol": PROTOCOL, "name": NAME, "version": __version__}
        )

    @app.post("/event-stream/")
    def post_es():  # C2
        body = request.get_json(silent=True) or {}
        routing_key = body.get("routing_key")
        if not routing_key:
            return jsonify({"detail": "routing_key is required"}), 422
        rec = registry.create(routing_key)
        return (
            jsonify({"id": rec["id"], "location": _location(request.host_url, rec["uuid"])}),
            201,
        )

    @app.get("/event-stream/")
    def get_es():  # C3
        streams = [
            {
                "id": r["id"],
                "location": _location(request.host_url, r["uuid"]),
                "routing_key": r["routing_key"],
            }
            for r in registry.list_all()
        ]
        return jsonify({"event_streams": streams})

    @app.delete("/event-stream/<int:es_id>")
    def delete_es(es_id: int):  # C4
        rec = registry.get_by_id(es_id)
        if rec is None:
            # 404 analog (app/app.py:688-694)
            return jsonify({"detail": f"EventStream {es_id} is not known"}), 404
        # Stop the live consumer synchronously — better than the reference,
        # where an idle consumer lingers until poisoned (SURVEY §3.4).
        manager.stop_consumer(rec["routing_key"])
        registry.delete(es_id)
        return "", 204

    @app.get("/event-stream/<es_uuid>/consume")
    def consume(es_uuid: str):  # C5
        params = {
            "stream_from_ordinal": request.args.get("stream_from_ordinal"),
            "stream_from_timestamp": request.args.get("stream_from_timestamp"),
            "stream_from_datetime": request.args.get("stream_from_datetime"),
        }
        given = [k for k, v in params.items() if v is not None]
        if len(given) > 1:
            # WS close 1002 analog (app/app.py:269-278)
            return (
                jsonify({"detail": "Cannot provide more than one 'stream_from_' variable"}),
                400,
            )
        rec = registry.get_by_uuid(es_uuid)
        if rec is None:
            # WS close 1000 "Connect for unknown EventStream" (app/app.py:287-291)
            return jsonify({"detail": "Connect for unknown EventStream"}), 404
        if not stream_exists(manager.log_root, rec["routing_key"]):
            # WS close 1013 analog (app/app.py:314-318)
            return jsonify({"detail": "EventStream backing stream not found"}), 503

        max_events = int(request.args.get("max_events", 100))
        timeout_s = float(request.args.get("timeout_s", 10.0))
        handle = manager.start_consumer(
            rec["routing_key"],
            starting_ordinal=(
                int(params["stream_from_ordinal"])
                if params["stream_from_ordinal"] is not None
                else None
            ),
            starting_timestamp_ms=(
                int(params["stream_from_timestamp"])
                if params["stream_from_timestamp"] is not None
                else None
            ),
            starting_datetime=params["stream_from_datetime"],
        )

        def generate():
            delivered = 0
            try:
                while delivered < max_events:
                    try:
                        chunk = handle.hub.get(timeout=timeout_s)
                    except queue.Empty:
                        break
                    if chunk is None:  # poison/stop sentinel
                        break
                    # The hub hands chunks (one per micro-batch slice);
                    # serve up to the max_events boundary in one yield.
                    take = chunk[: max_events - delivered]
                    yield "".join(d.out + "\n" for d in take)
                    delivered += len(take)
            finally:
                # by handle identity: a newer consume request may already
                # have replaced this stream's consumer — don't stop it
                manager.stop_consumer_if_current(rec["routing_key"], handle)

        return Response(generate(), mimetype="application/x-ndjson")

    return app


def serialize_stats(stats: dict) -> str:
    """A1 message-stats line (app/app.py:515-518 cadence semantics are the
    caller's concern; this is the payload shape)."""
    return json.dumps({"received": stats.get("received", 0), "sent": stats.get("sent", 0)})
