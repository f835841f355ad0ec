"""Control-plane API parity: C1-C5 shapes and error codes (SURVEY §2.8),
driven through the Flask test client with a live StreamManager."""

from __future__ import annotations

import json

import pytest

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import EventLogWriter
from squonk2_fastapi_ws_event_stream_spark.sources.registry import Registry
from squonk2_fastapi_ws_event_stream_spark.streaming.api import create_app
from squonk2_fastapi_ws_event_stream_spark.streaming.manager import StreamManager

BASE_TS = 1_700_000_000_000


@pytest.fixture()
def stack(spark, tmp_path):
    log_root = str(tmp_path / "log")
    registry = Registry(str(tmp_path / "es.db"))
    manager = StreamManager(spark, log_root, str(tmp_path / "ckpt"))
    app = create_app(spark, registry, manager)
    app.testing = True
    yield app.test_client(), registry, manager, log_root
    manager.stop_all()


def test_version_endpoint(stack):  # C1
    client, *_ = stack
    r = client.get("/event-stream/version/")
    assert r.status_code == 200
    body = r.get_json()
    assert set(body) == {"protocol", "name", "version"}


def test_create_list_delete_flow(stack):  # C2, C3, C4
    client, registry, manager, log_root = stack
    r = client.post("/event-stream/", json={"routing_key": "charges"})
    assert r.status_code == 201
    created = r.get_json()
    assert set(created) == {"id", "location"}
    assert "/event-stream/" in created["location"]

    r = client.get("/event-stream/")
    streams = r.get_json()["event_streams"]
    assert len(streams) == 1
    assert streams[0]["routing_key"] == "charges"
    assert streams[0]["id"] == created["id"]

    r = client.delete(f"/event-stream/{created['id']}")
    assert r.status_code == 204
    assert client.get("/event-stream/").get_json()["event_streams"] == []


def test_create_requires_routing_key(stack):
    client, *_ = stack
    assert client.post("/event-stream/", json={}).status_code == 422


def test_delete_unknown_id_404(stack):  # C4 404 path (app/app.py:688-694)
    client, *_ = stack
    r = client.delete("/event-stream/9999")
    assert r.status_code == 404


def test_consume_unknown_uuid_404(stack):  # WS close 1000 analog
    client, *_ = stack
    r = client.get("/event-stream/nonesuch/consume")
    assert r.status_code == 404
    assert "unknown EventStream" in r.get_json()["detail"]


def test_consume_missing_backing_stream_503(stack):  # WS close 1013 analog
    client, registry, *_ = stack
    rec = registry.create("ghost")
    r = client.get(f"/event-stream/{rec['uuid']}/consume")
    assert r.status_code == 503


def test_consume_mutually_exclusive_params_400(stack):  # WS close 1002 analog
    client, registry, manager, log_root = stack
    EventLogWriter(log_root, "charges").publish('{"a": 1}', BASE_TS)
    rec = registry.create("charges")
    r = client.get(
        f"/event-stream/{rec['uuid']}/consume"
        "?stream_from_ordinal=1&stream_from_timestamp=123"
    )
    assert r.status_code == 400
    assert "more than one 'stream_from_'" in r.get_json()["detail"]


def test_consume_end_to_end_with_replay(stack):  # C5 happy path + t1-smoke shape
    client, registry, manager, log_root = stack
    w = EventLogWriter(log_root, "charges")
    for i in range(5):
        w.publish(
            '{"message_type": "t", "message_body": {"sqn": %d}}' % i,
            timestamp_ms=BASE_TS + i * 1000,
        )
    rec = registry.create("charges")
    r = client.get(
        f"/event-stream/{rec['uuid']}/consume"
        "?stream_from_ordinal=1&max_events=3&timeout_s=60"
    )
    assert r.status_code == 200
    lines = [json.loads(line) for line in r.text.strip().splitlines()]
    # exclusive seek from 1 → ordinals 2,3,4 with enrichment
    # (ordinal n carries the n-th published message: sqn = n-1,
    # broker ts = BASE_TS + (n-1)*1000)
    assert [m["ess_ordinal"] for m in lines] == [2, 3, 4]
    assert all(m["ess_timestamp"] == BASE_TS + (m["ess_ordinal"] - 1) * 1000 for m in lines)
    assert all(m["message_body"]["sqn"] == m["ess_ordinal"] - 1 for m in lines)


def test_consume_poison_stops_consumer(stack):
    client, registry, manager, log_root = stack
    w = EventLogWriter(log_root, "charges")
    w.publish('{"message_type": "t", "message_body": {}}', BASE_TS)
    w.publish("POISON", BASE_TS + 1000)
    w.publish('{"never": "delivered"}', BASE_TS + 2000)
    rec = registry.create("charges")
    r = client.get(
        f"/event-stream/{rec['uuid']}/consume"
        "?stream_from_ordinal=0&max_events=10&timeout_s=60"
    )
    assert r.status_code == 200
    lines = [json.loads(line) for line in r.text.strip().splitlines()]
    # only the pre-poison message (ordinal 1) arrives; POISON is never forwarded
    assert len(lines) == 1
    assert lines[0]["ess_ordinal"] == 1


def test_stale_teardown_does_not_stop_replacement_consumer(stack):
    # A teardown path holding an old handle (finished request, poison-stop
    # thread) must not knock out a consumer that replaced it by name.
    import queue

    from squonk2_fastapi_ws_event_stream_spark.streaming.manager import ConsumerHandle

    _, _, manager, _ = stack

    class _FakeQuery:
        def __init__(self):
            self.stopped = False
            self.isActive = True

        def stop(self):
            self.stopped = True
            self.isActive = False

    old = ConsumerHandle(stream="s", hub=queue.Queue(), query=_FakeQuery())
    new = ConsumerHandle(stream="s", hub=queue.Queue(), query=_FakeQuery())
    manager._consumers["s"] = new

    manager.stop_consumer_if_current("s", old)
    assert old.query.stopped  # the stale handle itself is released
    assert not new.query.stopped  # the replacement keeps running
    assert manager._consumers["s"] is new

    manager.stop_consumer_if_current("s", new)
    assert new.query.stopped
    assert "s" not in manager._consumers
