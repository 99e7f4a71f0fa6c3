"""S7 topic-admin tests against an in-process fake broker.

The fake speaks just enough Kafka wire protocol (Metadata v1,
CreateTopics v0, DeleteTopics v0) for the client's full reference
flow — dial broker → find controller → create topic → tolerate
"already exists" (go/integration/integration_test.go:66-91) — to
execute end-to-end over a real TCP socket, no external broker needed.
"""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from flink_kakfa_spark.streaming.topics import (
    ERR_NONE,
    ERR_TOPIC_ALREADY_EXISTS,
    ERR_UNKNOWN_TOPIC,
    TopicAdminError,
    delete_topic,
    ensure_topic,
    find_controller,
    topic_exists,
)


def _s(s):  # Kafka STRING
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _null_s():
    return struct.pack(">h", -1)


class _FakeBroker(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.topics: set[str] = set()
        self.lock = threading.Lock()

    @property
    def addr(self) -> str:
        return f"127.0.0.1:{self.server_address[1]}"


class _Handler(socketserver.BaseRequestHandler):
    def _recv(self, n):
        buf = b""
        while len(buf) < n:
            b = self.request.recv(n - len(buf))
            if not b:
                raise ConnectionError
            buf += b
        return buf

    def handle(self):
        try:
            (size,) = struct.unpack(">i", self._recv(4))
        except ConnectionError:
            return
        payload = self._recv(size)
        api_key, _version, corr = struct.unpack(">hhi", payload[:8])
        (cid_len,) = struct.unpack(">h", payload[8:10])
        body = payload[10 + max(cid_len, 0):]
        srv: _FakeBroker = self.server  # type: ignore[assignment]
        if api_key == 3:
            resp = self._metadata(srv, body)
        elif api_key == 19:
            resp = self._create(srv, body)
        elif api_key == 20:
            resp = self._delete(srv, body)
        else:  # pragma: no cover - unexpected api
            resp = b""
        frame = struct.pack(">i", corr) + resp
        self.request.sendall(struct.pack(">i", len(frame)) + frame)

    def _requested_topics(self, body):
        (n,) = struct.unpack(">i", body[:4])
        pos, names = 4, []
        for _ in range(max(n, 0)):
            (ln,) = struct.unpack(">h", body[pos : pos + 2])
            names.append(body[pos + 2 : pos + 2 + ln].decode())
            pos += 2 + ln
        return None if n == -1 else names, pos

    def _metadata(self, srv, body):
        names, _ = self._requested_topics(body)
        with srv.lock:
            if names is None:
                names = sorted(srv.topics)
            known = srv.topics.copy()
        host, port = srv.server_address
        out = struct.pack(">i", 1)  # one broker: node 1 = this fake
        out += struct.pack(">i", 1) + _s(host) + struct.pack(">i", port)
        out += _null_s()  # rack
        out += struct.pack(">i", 1)  # controller_id = 1 (ourselves)
        out += struct.pack(">i", len(names))
        for t in names:
            err = ERR_NONE if t in known else ERR_UNKNOWN_TOPIC
            out += struct.pack(">h", err) + _s(t) + b"\x00"  # not internal
            out += struct.pack(">i", 0)  # no partition metadata
        return out

    def _create(self, srv, body):
        (n,) = struct.unpack(">i", body[:4])
        assert n == 1
        (ln,) = struct.unpack(">h", body[4:6])
        topic = body[6 : 6 + ln].decode()
        with srv.lock:
            err = ERR_TOPIC_ALREADY_EXISTS if topic in srv.topics else ERR_NONE
            srv.topics.add(topic)
        return struct.pack(">i", 1) + _s(topic) + struct.pack(">h", err)

    def _delete(self, srv, body):
        (n,) = struct.unpack(">i", body[:4])
        assert n == 1
        (ln,) = struct.unpack(">h", body[4:6])
        topic = body[6 : 6 + ln].decode()
        with srv.lock:
            err = ERR_NONE if topic in srv.topics else ERR_UNKNOWN_TOPIC
            srv.topics.discard(topic)
        return struct.pack(">i", 1) + _s(topic) + struct.pack(">h", err)


@pytest.fixture()
def broker():
    srv = _FakeBroker()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_controller_discovery(broker):
    ctrl = find_controller(broker.addr)
    assert ctrl.node_id == 1
    assert (ctrl.host, ctrl.port) == broker.server_address


def test_reference_topic_setup_flow(broker):
    """The exact ensureTestTopicExists sequence: create, then tolerate
    re-create (go/integration/integration_test.go:66-91)."""
    assert not topic_exists(broker.addr, "test-topic")
    assert ensure_topic(broker.addr, "test-topic") == "created"
    assert topic_exists(broker.addr, "test-topic")
    assert ensure_topic(broker.addr, "test-topic") == "exists"  # tolerated


def test_delete_roundtrip(broker):
    ensure_topic(broker.addr, "doomed")
    assert delete_topic(broker.addr, "doomed") == "deleted"
    assert delete_topic(broker.addr, "doomed") == "absent"
    assert not topic_exists(broker.addr, "doomed")


def test_unreachable_broker_raises():
    with pytest.raises(OSError):
        find_controller("127.0.0.1:1")  # nothing listens on port 1


def test_unknown_topic_probe_is_false_not_error(broker):
    # Metadata error 3 (unknown topic) maps to False, not an exception
    assert topic_exists(broker.addr, "never-created") is False


def test_truncated_response_raises():
    """A broker that closes mid-frame must surface TopicAdminError,
    not hang or return garbage."""
    import socket
    import struct as st

    lis = socket.socket()
    lis.bind(("127.0.0.1", 0))
    lis.listen(1)

    def _half_reply():
        conn, _ = lis.accept()
        conn.recv(4096)
        # claim an 8-byte frame but send only the 4-byte correlation id
        conn.sendall(st.pack(">i", 8) + st.pack(">i", 7))
        conn.close()

    t = threading.Thread(target=_half_reply, daemon=True)
    t.start()
    addr = f"127.0.0.1:{lis.getsockname()[1]}"
    with pytest.raises(TopicAdminError):
        find_controller(addr)
    lis.close()


def test_cli_topics_roundtrip(broker, capsys):
    """The `topics` subcommand drives the same flow the reference's
    test setup runs, end-to-end through argument parsing."""
    from flink_kakfa_spark.cli import main

    assert main(["topics", "exists", "cli-topic", "--broker", broker.addr]) == 0
    assert main(["topics", "ensure", "cli-topic", "--broker", broker.addr]) == 0
    assert main(["topics", "exists", "cli-topic", "--broker", broker.addr]) == 0
    assert main(["topics", "delete", "cli-topic", "--broker", broker.addr]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["false", "created", "true", "deleted"]
