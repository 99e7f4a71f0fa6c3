"""S2/S3 data-plane tests: RecordBatch codec, Produce/Fetch/ListOffsets
RPCs, and the distributed Spark read/write paths — all against an
in-process fake broker speaking spec frames over real TCP (the same
broker-free idiom as test_topics.py, extended to the data plane).

The integration test mirrors the reference's round-trip
(go/integration/integration_test.go:20-62): produce generated
sentences, consume them back through Spark, and assert the word count
equals the batch word count of the same sentences.
"""

from __future__ import annotations

import socketserver
import struct
import threading
import time

import pytest

from flink_kakfa_spark.streaming.topics import TopicAdminError
from flink_kakfa_spark.streaming.wire import (
    EARLIEST,
    LATEST,
    crc32c,
    decode_record_batches,
    dec_varint,
    enc_varint,
    encode_record_batch,
    fetch,
    fetch_all,
    list_offset,
    produce,
)


def _s(s):
    b = s.encode()
    return struct.pack(">h", len(b)) + b


class _DataBroker(socketserver.ThreadingTCPServer):
    """Fake broker: Metadata v1 (with partition metadata), Produce v3,
    Fetch v4, ListOffsets v1. One request per connection, like the
    client's one-shot _rpc."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _DataHandler)
        self.topics: dict[str, dict[int, dict]] = {}
        self.lock = threading.Lock()

    def add_topic(self, name: str, n_parts: int = 1) -> None:
        with self.lock:
            self.topics[name] = {
                p: {"batches": [], "next": 0} for p in range(n_parts)
            }

    @property
    def addr(self) -> str:
        return f"127.0.0.1:{self.server_address[1]}"


class _Cursor:
    def __init__(self, buf):
        self.buf, self.pos = buf, 0

    def take(self, n):
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i16(self):
        return struct.unpack(">h", self.take(2))[0]

    def i32(self):
        return struct.unpack(">i", self.take(4))[0]

    def i64(self):
        return struct.unpack(">q", self.take(8))[0]

    def i8(self):
        return struct.unpack(">b", self.take(1))[0]

    def string(self):
        n = self.i16()
        return None if n == -1 else self.take(n).decode()

    def bytes_(self):
        n = self.i32()
        return b"" if n <= 0 else self.take(n)


class _DataHandler(socketserver.BaseRequestHandler):
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
        body = _Cursor(payload[10 + max(cid_len, 0):])
        srv: _DataBroker = self.server  # type: ignore[assignment]
        if api_key == 3:
            resp = self._metadata(srv, body)
        elif api_key == 0:
            resp = self._produce(srv, body)
        elif api_key == 1:
            resp = self._fetch(srv, body)
        elif api_key == 2:
            resp = self._list_offsets(srv, body)
        else:  # pragma: no cover
            resp = b""
        frame = struct.pack(">i", corr) + resp
        self.request.sendall(struct.pack(">i", len(frame)) + frame)

    def _metadata(self, srv, body):
        n = body.i32()
        names = [body.string() for _ in range(max(n, 0))]
        with srv.lock:
            topics = {t: sorted(ps) for t, ps in srv.topics.items()}
        if n == -1 or not names:
            names = sorted(topics)
        host, port = srv.server_address
        out = struct.pack(">i", 1)
        out += struct.pack(">i", 1) + _s(host) + struct.pack(">i", port)
        out += struct.pack(">h", -1)  # null rack
        out += struct.pack(">i", 1)  # controller
        out += struct.pack(">i", len(names))
        for t in names:
            known = t in topics
            out += struct.pack(">h", 0 if known else 3) + _s(t) + b"\x00"
            pids = topics.get(t, [])
            out += struct.pack(">i", len(pids))
            for p in pids:
                out += struct.pack(">hiii", 0, p, 1, 1)  # err, pid, leader, 1 replica
                out += struct.pack(">i", 1)  # replica id
                out += struct.pack(">ii", 1, 1)  # isr: [1]
        return out

    def _produce(self, srv, body):
        body.string()  # transactional_id
        body.i16()  # acks
        body.i32()  # timeout
        out_parts = []
        for _ in range(body.i32()):
            topic = body.string()
            for _ in range(body.i32()):
                pid = body.i32()
                record_set = body.bytes_()
                recs = decode_record_batches(record_set)
                with srv.lock:
                    part = srv.topics.get(topic, {}).get(pid)
                    if part is None:
                        out_parts.append((topic, pid, 3, -1))  # unknown topic
                        continue
                    base = part["next"]
                    stored = encode_record_batch(
                        [(r.key, r.value, r.headers) for r in recs],
                        base_offset=base,
                        timestamp_ms=recs[0].timestamp_ms,
                    )
                    part["batches"].append((base, base + len(recs) - 1, stored))
                    part["next"] = base + len(recs)
                out_parts.append((topic, pid, 0, base))
        out = struct.pack(">i", len(out_parts))
        for topic, pid, err, base in out_parts:
            out += _s(topic) + struct.pack(">i", 1)
            out += struct.pack(">ihqq", pid, err, base, -1)
        out += struct.pack(">i", 0)  # throttle
        return out

    def _fetch(self, srv, body):
        body.i32()  # replica
        body.i32()  # max_wait
        body.i32()  # min_bytes
        body.i32()  # max_bytes
        body.i8()  # isolation
        out = struct.pack(">i", 0)  # throttle first (v1+)
        n_topics = body.i32()
        out += struct.pack(">i", n_topics)
        for _ in range(n_topics):
            topic = body.string()
            n_parts = body.i32()
            out += _s(topic) + struct.pack(">i", n_parts)
            for _ in range(n_parts):
                pid = body.i32()
                off = body.i64()
                body.i32()  # partition max bytes
                with srv.lock:
                    part = srv.topics.get(topic, {}).get(pid)
                    if part is None:
                        out += struct.pack(">ihqqi", pid, 3, -1, -1, 0)
                        out += struct.pack(">i", 0)
                        continue
                    chunks = [
                        raw
                        for lo, hi, raw in part["batches"]
                        if hi >= off
                    ]
                    hwm = part["next"]
                record_set = b"".join(chunks)
                out += struct.pack(">ihqqi", pid, 0, hwm, hwm, 0)
                out += struct.pack(">i", len(record_set)) + record_set
        return out

    def _list_offsets(self, srv, body):
        body.i32()  # replica
        out_parts = []
        for _ in range(body.i32()):
            topic = body.string()
            for _ in range(body.i32()):
                pid = body.i32()
                at = body.i64()
                with srv.lock:
                    part = srv.topics.get(topic, {}).get(pid)
                    nxt = -1 if part is None else part["next"]
                err = 3 if part is None else 0
                off = 0 if at == EARLIEST else nxt
                out_parts.append((topic, pid, err, off))
        out = struct.pack(">i", len(out_parts))
        for topic, pid, err, off in out_parts:
            out += _s(topic) + struct.pack(">i", 1)
            out += struct.pack(">ihqq", pid, err, -1, off)
        return out


@pytest.fixture()
def broker():
    srv = _DataBroker()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


# ----------------------------------------------------------- codec unit


def test_crc32c_known_answer():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_varint_roundtrip_signed():
    for v in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31, -(2**31), 2**62):
        b = enc_varint(v)
        got, pos = dec_varint(b, 0)
        assert (got, pos) == (v, len(b))


def test_record_batch_roundtrip_and_crc_guard():
    recs = [(b"k", b"hello"), (None, b"world"), (b"k3", None)]
    batch = encode_record_batch(recs, base_offset=7, timestamp_ms=1_700_000_000_000)
    out = decode_record_batches(batch)
    assert [(r.key, r.value) for r in out] == recs
    assert [r.offset for r in out] == [7, 8, 9]
    corrupt = bytearray(batch)
    corrupt[-1] ^= 0xFF
    with pytest.raises(TopicAdminError, match="CRC"):
        decode_record_batches(bytes(corrupt))


def test_multi_batch_set_with_trailing_partial():
    b1 = encode_record_batch([(b"a", b"1"), (b"b", b"2")], base_offset=0)
    b2 = encode_record_batch([(b"c", b"3")], base_offset=2)
    recs = decode_record_batches(b1 + b2 + b1[:11])
    assert [r.offset for r in recs] == [0, 1, 2]


# ------------------------------------------------------------ RPC paths


def test_produce_fetch_roundtrip(broker):
    broker.add_topic("t", 1)
    base = produce(broker.addr, "t", [(b"k1", b"v1"), (None, b"v2")])
    assert base == 0
    assert produce(broker.addr, "t", [(b"k3", b"v3")]) == 2
    recs, hwm = fetch(broker.addr, "t", 0, 0)
    assert hwm == 3
    assert [(r.key, r.value) for r in recs] == [
        (b"k1", b"v1"),
        (None, b"v2"),
        (b"k3", b"v3"),
    ]
    # offset-bounded fetch skips whole earlier batches
    recs2, _ = fetch(broker.addr, "t", 0, 2)
    assert [r.offset for r in recs2] == [2]


def test_list_offsets_earliest_latest(broker):
    broker.add_topic("t", 1)
    assert list_offset(broker.addr, "t", 0, EARLIEST) == 0
    assert list_offset(broker.addr, "t", 0, LATEST) == 0
    produce(broker.addr, "t", [(None, b"x")] * 5)
    assert list_offset(broker.addr, "t", 0, LATEST) == 5


def test_produce_to_unknown_topic_raises(broker):
    with pytest.raises(TopicAdminError, match="error 3"):
        produce(broker.addr, "missing", [(None, b"v")])


def test_fetch_all_drains_across_batches(broker):
    broker.add_topic("t", 1)
    for i in range(7):
        produce(broker.addr, "t", [(None, f"m{i}".encode())])
    recs = fetch_all(broker.addr, "t", 0)
    assert [r.value for r in recs] == [f"m{i}".encode() for i in range(7)]


# ------------------------------------------------------ Spark data plane


def test_spark_read_topic_distributed(spark, broker):
    from flink_kakfa_spark.streaming.dataplane import read_topic

    broker.add_topic("t2", 2)
    produce(broker.addr, "t2", [(b"a", b"p0-first"), (b"b", b"p0-second")], 0)
    produce(broker.addr, "t2", [(None, b"p1-only")], 1)
    df = read_topic(spark, broker.addr, "t2")
    rows = df.collect()
    assert {
        (bytes(r["value"]), r["partition"], r["offset"]) for r in rows
    } == {(b"p0-first", 0, 0), (b"p0-second", 0, 1), (b"p1-only", 1, 0)}
    assert all(r["topic"] == "t2" for r in rows)


def test_spark_write_topic_round_robin(spark, broker):
    from pyspark.sql import functions as F

    from flink_kakfa_spark.streaming.dataplane import read_topic, write_topic

    broker.add_topic("t3", 2)
    df = spark.range(20).select(
        F.concat_ws("-", F.lit("msg"), F.col("id")).alias("value")
    )
    n = write_topic(df, broker.addr, "t3")
    assert n == 20
    back = read_topic(spark, broker.addr, "t3").collect()
    assert len(back) == 20
    assert {bytes(r["value"]).decode() for r in back} == {
        f"msg-{i}" for i in range(20)
    }
    assert {r["partition"] for r in back} == {0, 1}


def test_kafka_wordcount_round_trip(spark, broker):
    """The reference's integration flow: produce sentences -> consume via
    Spark -> word count == batch word count of the same sentences
    (go/integration/integration_test.go:20-62)."""
    from pyspark.sql import functions as F

    from flink_kakfa_spark.streaming.dataplane import read_topic, write_topic
    from flink_kakfa_spark.streaming.generator import sentence_batch

    broker.add_topic("wc", 2)
    sent = sentence_batch(spark, 60).select("value")
    assert write_topic(sent, broker.addr, "wc") == 60

    consumed = read_topic(spark, broker.addr, "wc").select(
        F.col("value").cast("string").alias("line")
    )
    got = {
        (r["word"], r["cnt"])
        for r in consumed.select(
            F.explode(F.split("line", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want = {
        (r["word"], r["cnt"])
        for r in sent.select(
            F.explode(F.split(F.col("value"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_foreach_batch_sink_streams_to_kafka(spark, broker, tmp_path):
    """A streaming query sinks micro-batches to the topic through the
    foreachBatch adapter; records land with their payloads intact."""
    import time

    from pyspark.sql import functions as F

    from flink_kakfa_spark.streaming.dataplane import foreach_batch_sink

    broker.add_topic("s1", 1)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .select(F.concat_ws("-", F.lit("r"), F.col("value")).alias("value"))
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_sink(broker.addr, "s1"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if list_offset(broker.addr, "s1", 0, LATEST) > 0:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    recs = fetch_all(broker.addr, "s1", 0)
    assert recs, "no records reached the topic"
    assert all(bytes(r.value).startswith(b"r-") for r in recs)


def test_cli_producer_consumer_via_stdlib_data_plane(
    spark, broker, tmp_path, monkeypatch, capsys
):
    """The reference's full lifecycle, jar-free: `producer` streams
    generated sentences into the topic through the foreachBatch
    fallback, `consumer` drains and logs them reference-style
    ("Received: ..."), both configured via the same env vars the
    reference honors."""
    import json
    from argparse import Namespace

    from flink_kakfa_spark.cli import cmd_consumer, cmd_producer

    broker.add_topic("cli-words", 1)
    monkeypatch.setenv("KAFKA_BROKER", broker.addr)
    monkeypatch.setenv("KAFKA_TOPIC", "cli-words")
    cfg_path = tmp_path / "producer.json"
    cfg_path.write_text(json.dumps({"interval": "50ms"}))

    rc = cmd_producer(
        Namespace(
            config=str(cfg_path),
            sink=None,
            checkpoint=str(tmp_path / "ckpt"),
            duration=8,
        )
    )
    assert rc == 0
    # quiescence poll (reference's deadline loop,
    # go/integration/integration_test.go:122-140): cmd_producer's
    # stop() interrupts the final micro-batch, but produce RPCs its
    # executor tasks already opened can still be queued in the fake
    # broker's accept loop — sampling LATEST immediately undercounts
    # what eventually lands (observed 80-sampled vs 140-landed on a
    # contended host). Wait for the offset to hold still before
    # pinning the expected count.
    n, stable_since = 0, time.time()
    deadline = time.time() + 30
    while time.time() < deadline:
        cur = list_offset(broker.addr, "cli-words", 0, LATEST)
        if cur != n:
            n, stable_since = cur, time.time()
        elif n > 0 and time.time() - stable_since >= 2.0:
            break
        time.sleep(0.25)
    assert n > 0, "producer wrote nothing through the stdlib sink"

    rc = cmd_consumer(
        Namespace(config=None, source=None, duration=None, available_now=True)
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("Received: ") == n


def test_incremental_read_sees_each_record_exactly_once(spark, broker):
    """Two consume rounds with caller-persisted offsets: no overlap, no
    gap, and a replay of round 1's offsets reproduces round 1 exactly —
    the exactly-once contract consumer groups cannot give."""
    from flink_kakfa_spark.streaming.dataplane import read_topic_incremental

    broker.add_topic("inc", 2)
    produce(broker.addr, "inc", [(None, b"a0"), (None, b"a1")], 0)
    produce(broker.addr, "inc", [(None, b"b0")], 1)

    df1, end1 = read_topic_incremental(spark, broker.addr, "inc")
    got1 = {(r["partition"], r["offset"], bytes(r["value"])) for r in df1.collect()}
    assert got1 == {(0, 0, b"a0"), (0, 1, b"a1"), (1, 0, b"b0")}
    assert end1 == {0: 2, 1: 1}

    produce(broker.addr, "inc", [(None, b"a2")], 0)
    df2, end2 = read_topic_incremental(spark, broker.addr, "inc", end1)
    got2 = {(r["partition"], r["offset"], bytes(r["value"])) for r in df2.collect()}
    assert got2 == {(0, 2, b"a2")}
    assert end2 == {0: 3, 1: 1}

    # replay round 1 from the same offsets: byte-identical increment
    df1r, _ = read_topic_incremental(spark, broker.addr, "inc", {0: 0, 1: 0})
    full = {(r["partition"], r["offset"], bytes(r["value"])) for r in df1r.collect()}
    assert full == got1 | got2


def _counts_dict(df):
    return {r["word"]: r["cnt"] for r in df.collect()}


def test_kafka_matview_exactly_once_across_increments_and_crash(
    spark, broker, tmp_path
):
    """Two increments accumulate correctly; a simulated crash between
    the table write and the commit rename replays the SAME offset range
    without double counting."""
    import json
    import os
    import shutil

    from flink_kakfa_spark.streaming.kafka_matview import (
        consume_wordcount_increment,
        current_counts,
    )

    broker.add_topic("mv", 1)
    state = str(tmp_path / "state")

    produce(broker.addr, "mv", [(None, b"alpha beta"), (None, b"alpha")])
    c1 = consume_wordcount_increment(spark, broker.addr, "mv", state)
    assert c1["version"] == 1 and c1["new_rows"] == 2
    assert _counts_dict(current_counts(spark, state)) == {"alpha": 2, "beta": 1}

    produce(broker.addr, "mv", [(None, b"beta gamma")])
    c2 = consume_wordcount_increment(spark, broker.addr, "mv", state)
    assert c2["version"] == 2 and c2["new_rows"] == 1
    assert _counts_dict(current_counts(spark, state)) == {
        "alpha": 2,
        "beta": 2,
        "gamma": 1,
    }

    # no new data: no version churn
    c3 = consume_wordcount_increment(spark, broker.addr, "mv", state)
    assert c3["version"] == 2 and c3["new_rows"] == 0

    # crash simulation: v3 was written but the commit rename never
    # happened — roll the commit file back to v1 and delete v2's
    # authority; replaying from the v1 offsets must reproduce v2's
    # totals exactly (the same offset range re-read, not re-counted
    # on top of itself)
    with open(os.path.join(state, "commit.json")) as f:
        committed = json.load(f)
    assert committed["version"] == 2
    rollback = {"version": 1, "offsets": {"0": 2}}
    with open(os.path.join(state, "commit.json"), "w") as f:
        json.dump(rollback, f)
    shutil.rmtree(os.path.join(state, "v2"))

    c4 = consume_wordcount_increment(spark, broker.addr, "mv", state)
    assert c4["version"] == 2 and c4["new_rows"] == 1
    assert _counts_dict(current_counts(spark, state)) == {
        "alpha": 2,
        "beta": 2,
        "gamma": 1,
    }


def test_record_batch_roundtrip_property():
    """Property: any list of optional-bytes (key, value) pairs survives
    encode->decode bit-exactly, at any base offset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    opt_bytes = st.one_of(st.none(), st.binary(max_size=200))

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.tuples(opt_bytes, opt_bytes), min_size=1, max_size=20),
        st.integers(min_value=0, max_value=2**40),
    )
    def check(pairs, base):
        batch = encode_record_batch(pairs, base_offset=base, timestamp_ms=1)
        out = decode_record_batches(batch)
        assert [(r.key, r.value) for r in out] == pairs
        assert [r.offset for r in out] == list(range(base, base + len(pairs)))

    check()


def test_record_batch_gzip_and_headers_roundtrip(broker):
    """Gzip-compressed batches with record headers survive the full
    produce->store->fetch path (broker re-encodes uncompressed — codec
    negotiation is per-batch, exactly as real brokers may down-convert)."""
    hdrs = [("trace-id", b"abc123"), ("null-h", None)]
    batch = encode_record_batch(
        [(b"k", b"compressed payload " * 20, hdrs)],
        base_offset=0,
        timestamp_ms=5,
        compress=True,
    )
    plain = encode_record_batch(
        [(b"k", b"compressed payload " * 20, hdrs)],
        base_offset=0,
        timestamp_ms=5,
    )
    assert len(batch) < len(plain)  # gzip actually engaged
    out = decode_record_batches(batch)
    assert out[0].value == b"compressed payload " * 20
    assert out[0].headers == (("trace-id", b"abc123"), ("null-h", None))

    broker.add_topic("gz", 1)
    produce(broker.addr, "gz", [(b"k", b"via-rpc", [("h", b"v")])])
    recs, _ = fetch(broker.addr, "gz", 0, 0)
    assert recs[0].headers == (("h", b"v"),)


def test_decoder_never_crashes_on_arbitrary_bytes():
    """Property: decode_record_batches on arbitrary bytes either
    returns records or raises TopicAdminError — never hangs, never
    raises anything else (hostile/corrupt broker hardening)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def check(blob):
        try:
            decode_record_batches(blob)
        except TopicAdminError:
            pass

    check()

    # a structurally-valid prefix with a corrupted interior must raise
    # TopicAdminError (CRC), not IndexError/struct.error
    good = encode_record_batch([(b"k", b"v" * 50)])
    for i in range(20, len(good), 7):
        mutated = bytearray(good)
        mutated[i] ^= 0x55
        try:
            decode_record_batches(bytes(mutated))
        except TopicAdminError:
            pass
