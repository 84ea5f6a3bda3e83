"""transformWithState operators (``streaming/stateful.py``).

The state-server protocol needs a protobuf runtime. Where the real
``protobuf`` package is absent (this container), the engine's
wire-exact pure-Python shim (``streaming/protoshim.py``) is installed
by the build-time gate (driver) and the processors' ``__setstate__``
(workers), so the end-to-end tests run EVERYWHERE — the JVM state
server is the wire-format oracle. The suite also verifies the
processor LOGIC against faked state/timer handles (merge, timer
re-arm, close-out emission, TTL first-wins) and the shim's codec
against hand-computed wire bytes."""

import pandas as pd
import pytest

from xarray_dataaccessor_spark.streaming.stateful import (
    _duration_ms,
    _FirstSeenTTLProcessor,
    _SessionTimerProcessor,
    dedup_first_seen_ttl,
    drain_available_now,
    require_transform_with_state,
    sessionize_with_timers,
)


@pytest.fixture
def rocksdb_state(spark):
    """RocksDB state-store provider + few state partitions, RESTORED on
    exit: the previous spelling set the provider on the shared session
    and leaked it into every later streaming test, and ran each stateful
    micro-batch with one RocksDB instance per session-default shuffle
    partition (32 under the verify driver's core count) for a handful of
    keys."""
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    sp_key = "spark.sql.shuffle.partitions"
    prev_prov = spark.conf.get(prov_key, None)
    prev_sp = spark.conf.get(sp_key)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set(sp_key, "4")
    yield
    spark.conf.set(sp_key, prev_sp)
    if prev_prov is None:
        spark.conf.unset(prov_key)
    else:
        spark.conf.set(prov_key, prev_prov)

_HAS_REAL_PROTOBUF = True
try:
    from google.protobuf import descriptor as _real_desc  # noqa: F401

    _HAS_REAL_PROTOBUF = not getattr(
        __import__("sys").modules.get("google.protobuf"),
        "__xda_protoshim__",
        False,
    )
except ImportError:
    _HAS_REAL_PROTOBUF = False


# ---------------------------------------------------------------------------
# gate + parsing
# ---------------------------------------------------------------------------


def test_gate_opens_via_shim_or_real_protobuf():
    # r12: the gate installs the protoshim when real protobuf is absent
    require_transform_with_state()
    from google.protobuf import descriptor  # noqa: F401


def test_protoshim_wire_codec_hand_computed_bytes():
    from xarray_dataaccessor_spark.streaming.protoshim import (
        install_protobuf_shim,
    )

    install_protobuf_shim()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020801")
    # an explicitly-set EMPTY oneof arm still emits its field
    m2 = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert m2.SerializeToString() == bytes.fromhex("22021200")
    resp = sm.StateResponse()
    resp.ParseFromString(bytes.fromhex("1a0378797a"))
    assert (resp.statusCode, resp.errorMessage, resp.value) == (0, "", b"xyz")
    # negative int64 round-trip (10-byte two's-complement varint)
    r = sm.StateResponseWithLongTypeVal(value=-3)
    r2 = sm.StateResponseWithLongTypeVal()
    r2.ParseFromString(r.SerializeToString())
    assert r2.value == -3
    # repeated message + string/ttl round-trip
    t1, t2 = sm.TimerInfo(key=b"k1", timestampMs=123), sm.TimerInfo(
        timestampMs=456
    )
    outer = sm.StateResponseWithTimer(timer=[t1, t2], requireNextFetch=True)
    back = sm.StateResponseWithTimer()
    back.ParseFromString(outer.SerializeToString())
    assert [(x.key, x.timestampMs) for x in back.timer] == [
        (b"k1", 123),
        (b"", 456),
    ]
    c = sm.StateCallCommand(
        stateName="s1", schema="v int", ttl=sm.TTLConfig(durationMs=5000)
    )
    cb = sm.StateCallCommand()
    cb.ParseFromString(c.SerializeToString())
    assert (cb.stateName, cb.schema, cb.ttl.durationMs) == (
        "s1",
        "v int",
        5000,
    )
    # submessage AUTO-VIVIFICATION: the state client sets TTL via
    # `cmd.ttl.durationMs = x` — the child must link to the parent
    # (a throwaway default instance silently dropped the TTL; caught by
    # the end-to-end TTL-expiry test) — while a pure READ of an unset
    # submessage must NOT mark presence
    viv = sm.StateCallCommand(stateName="s2")
    viv.ttl.durationMs = 77
    vb = sm.StateCallCommand()
    vb.ParseFromString(viv.SerializeToString())
    assert vb.HasField("ttl") and vb.ttl.durationMs == 77
    ro = sm.StateCallCommand(stateName="s3")
    _ = ro.ttl  # read-only access
    rb = sm.StateCallCommand()
    rb.ParseFromString(ro.SerializeToString())
    assert not rb.HasField("ttl") and rb.ttl.durationMs == 0


def test_duration_parsing():
    assert _duration_ms("30 minutes") == 30 * 60_000
    assert _duration_ms("1 hour") == 3_600_000
    assert _duration_ms("7 days") == 7 * 86_400_000
    assert _duration_ms("500 milliseconds") == 500


# ---------------------------------------------------------------------------
# processor logic against faked handles (protocol-free)
# ---------------------------------------------------------------------------


class FakeValueState:
    def __init__(self):
        self.v = None
        self.ttl_ms = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, t):
        self.v = tuple(t)

    def clear(self):
        self.v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        st = self.states.setdefault(name, FakeValueState())
        st.ttl_ms = ttlDurationMs
        return st

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


class FakeTimerValues:
    def __init__(self, proc_ms=1_000_000, wm_ms=0):
        self._p, self._w = proc_ms, wm_ms

    def getCurrentProcessingTimeInMs(self):
        return self._p

    def getCurrentWatermarkInMs(self):
        return self._w


def _events(ts_amounts):
    return pd.DataFrame(
        {
            "event_time": pd.to_datetime([t for t, _ in ts_amounts]),
            "amount": [a for _, a in ts_amounts],
        }
    )


US = 1_000_000  # µs per second


def test_session_processor_merges_and_rearms_timer():
    p = _SessionTimerProcessor(gap_ms=600_000)  # 10 min
    h = FakeHandle()
    p.init(h)

    out = list(
        p.handleInputRows(
            (1,),
            iter(
                [
                    _events(
                        [
                            ("2024-01-01 10:00:00", 5.0),
                            ("2024-01-01 10:05:00", 7.0),
                        ]
                    )
                ]
            ),
            FakeTimerValues(),
        )
    )
    assert out == []  # nothing emits on input
    s = h.states["session"].v
    t0 = pd.Timestamp("2024-01-01 10:00:00").value // 1000
    t1 = pd.Timestamp("2024-01-01 10:05:00").value // 1000
    assert s == (t0, t1, 2, 12.0)
    assert h.timers == {t1 // 1000 + 600_000}

    # second batch extends the session: old timer deleted, new one armed
    list(
        p.handleInputRows(
            (1,),
            iter([_events([("2024-01-01 10:08:00", 1.0)])]),
            FakeTimerValues(),
        )
    )
    t2 = pd.Timestamp("2024-01-01 10:08:00").value // 1000
    assert h.states["session"].v == (t0, t2, 3, 13.0)
    assert h.timers == {t2 // 1000 + 600_000}


def test_session_processor_timer_emits_and_clears():
    p = _SessionTimerProcessor(gap_ms=600_000)
    h = FakeHandle()
    p.init(h)
    list(
        p.handleInputRows(
            (7,),
            iter([_events([("2024-01-01 10:00:00", 3.5)])]),
            FakeTimerValues(),
        )
    )

    class Expired:
        def getExpiryTimeInMs(self):
            return next(iter(h.timers))

    out = list(p.handleExpiredTimer((7,), FakeTimerValues(), Expired()))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 7
    assert str(row["session_start"]) == "2024-01-01 10:00:00"
    assert str(row["session_end"]) == "2024-01-01 10:00:00"
    assert row["n_events"] == 1 and row["total_amount"] == 3.5
    assert h.states["session"].v is None  # cleared
    # a stale timer after close emits nothing
    assert list(p.handleExpiredTimer((7,), FakeTimerValues(), Expired())) == []


def test_first_seen_ttl_processor_first_wins():
    p = _FirstSeenTTLProcessor(ttl_ms=1000)
    h = FakeHandle()
    p.init(h)
    assert h.states["seen"].ttl_ms == 1000  # TTL threaded to the store

    batch = pd.DataFrame({"fingerprint": ["a", "a"], "doc_id": [1, 2]})
    out = list(p.handleInputRows(("a",), iter([batch]), FakeTimerValues()))
    assert len(out) == 1 and out[0].iloc[0]["doc_id"] == 1  # first wins
    # replay while marker alive: suppressed
    assert (
        list(p.handleInputRows(("a",), iter([batch]), FakeTimerValues()))
        == []
    )
    # store evicts the marker at TTL: key is eligible again
    h.states["seen"].clear()
    out2 = list(p.handleInputRows(("a",), iter([batch]), FakeTimerValues()))
    assert len(out2) == 1


# ---------------------------------------------------------------------------
# end-to-end (activates only where protobuf is installed)
# ---------------------------------------------------------------------------


def test_sessionize_with_timers_end_to_end(spark, rocksdb_state, tmp_path):
    import os

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_time", "amount"]
        )
        pdf["event_time"] = pd.to_datetime(pdf["event_time"])
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(feed, name))

    def run(sess):
        q = (
            sess.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    write_batch(
        "b1",
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-01 10:05:00", 7.0),
            (2, "2024-01-01 10:00:00", 1.0),
        ],
    )
    stream = spark.readStream.schema(
        "user_id long, event_time timestamp, amount double"
    ).parquet(feed + "/*")
    sess = sessionize_with_timers(
        stream, gap="10 minutes", watermark_delay="1 minute"
    )
    run(sess)
    write_batch("b2", [(1, "2024-01-01 11:00:00", 2.0)])
    run(sess)
    got = (
        spark.read.parquet(sink)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == 2
    r1 = got[got.user_id == 1].iloc[0]
    assert r1.n_events == 2 and abs(r1.total_amount - 12.0) < 1e-9


def test_dedup_first_seen_ttl_end_to_end(spark, rocksdb_state, tmp_path):
    import os

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["k", "event_time", "v"])
        pdf["event_time"] = pd.to_datetime(pdf["event_time"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            os.path.join(feed, name)
        )

    stream = spark.readStream.schema(
        "k string, event_time timestamp, v double"
    ).parquet(feed + "/*")
    dedup = dedup_first_seen_ttl(
        stream, key_col="k", ttl=None,
        payload_schema="k string, event_time timestamp, v double",
    )

    def run():
        q = (
            dedup.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    write_batch(
        "b1",
        [
            ("a", "2024-01-01 10:00:00", 1.0),
            ("a", "2024-01-01 10:00:05", 2.0),
            ("b", "2024-01-01 10:00:00", 3.0),
        ],
    )
    run()
    got1 = spark.read.parquet(sink).toPandas()
    assert sorted(got1["k"]) == ["a", "b"]  # first-seen within the batch

    write_batch("b2", [("a", "2024-01-01 10:30:00", 9.0),
                       ("c", "2024-01-01 10:30:00", 4.0)])
    run()
    got2 = spark.read.parquet(sink).toPandas()
    # 'a' already seen (no TTL -> suppressed forever); 'c' is new
    assert sorted(got2["k"]) == ["a", "b", "c"]


def test_dedup_ttl_expiry_reemits_end_to_end(spark, rocksdb_state, tmp_path):
    """Store-enforced TTL through a real state-server round trip: after
    the retention lapses, the same key is eligible again.

    Uses :func:`drain_available_now` because ``timeMode=
    "processingtime"`` keeps an availableNow run alive with empty
    cleanup batches forever — the bare ``awaitTermination(180)``
    spelling burned its full bound twice (367 s, 28 % of the whole
    suite)."""
    import os
    import time as _time

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["k", "v"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            os.path.join(feed, name)
        )

    stream = spark.readStream.schema("k string, v double").parquet(
        feed + "/*"
    )
    dedup = dedup_first_seen_ttl(
        stream, key_col="k", ttl="1 second",
        payload_schema="k string, v double",
    )

    def run():
        q = (
            dedup.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q, bound_s=180)

    write_batch("b1", [("a", 1.0), ("a", 2.0)])
    run()
    assert spark.read.parquet(sink).count() == 1  # first-seen only

    _time.sleep(5.0)  # let the 1-second TTL lapse (processing time)
    write_batch("b2", [("a", 9.0)])
    run()
    got = spark.read.parquet(sink).toPandas().sort_values("v")
    # the marker expired, so 'a' re-emitted: 2 rows total
    assert list(got["k"]) == ["a", "a"]


def test_protoshim_randomized_roundtrip_all_messages():
    """Seeded fuzz over EVERY message type in the StateMessage schema:
    random field assignments (scalars, bytes, enums, nested messages,
    repeateds) must survive serialize -> parse bit-exactly. Catches
    wire-format defects (tag order, varint edges, length framing) the
    hand-computed cases miss."""
    import random

    from xarray_dataaccessor_spark.streaming.protoshim import (
        LABEL_REPEATED,
        TYPE_BOOL,
        TYPE_BYTES,
        TYPE_ENUM,
        TYPE_INT32,
        TYPE_INT64,
        TYPE_MESSAGE,
        TYPE_STRING,
        install_protobuf_shim,
        _class_for,
    )

    install_protobuf_shim()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    rng = random.Random(0xC0FFEE)
    registry = sm.DESCRIPTOR._registry

    def rand_value(f, depth):
        if f.type == TYPE_INT32:
            return rng.choice([0, 1, -1, 127, -128, 2**31 - 1, -(2**31)])
        if f.type == TYPE_INT64:
            return rng.choice([0, -3, 300, 2**62, -(2**62)])
        if f.type == TYPE_BOOL:
            return rng.random() < 0.5
        if f.type == TYPE_STRING:
            return "".join(
                rng.choice("abc é中") for _ in range(rng.randrange(6))
            )
        if f.type == TYPE_BYTES:
            return bytes(rng.randrange(256) for _ in range(rng.randrange(9)))
        if f.type == TYPE_ENUM:
            return rng.randrange(6)
        if f.type == TYPE_MESSAGE and depth < 3:
            return rand_msg(f.message_type, depth + 1)
        return None

    def rand_msg(desc, depth=0):
        cls = _class_for(desc)
        kw = {}
        for f in desc.fields:
            if rng.random() < 0.4:
                continue  # leave unset
            if f.label == LABEL_REPEATED:
                vals = [
                    rand_value(f, depth) for _ in range(rng.randrange(4))
                ]
                vals = [v for v in vals if v is not None]
                if vals:
                    kw[f.name] = vals
            else:
                v = rand_value(f, depth)
                if v is not None:
                    kw[f.name] = v
        return cls(**kw)

    def as_tree(m):
        out = {}
        for name, v in m._values.items():
            if isinstance(v, list):
                out[name] = [
                    as_tree(x) if hasattr(x, "_values") else x for x in v
                ]
            elif hasattr(v, "_values"):
                if m._is_unwritten_vivified(v):
                    continue  # absent on the wire by design
                out[name] = as_tree(v)
            else:
                out[name] = v
        return out

    n_checked = 0
    for full, desc in sorted(registry.items()):
        if not hasattr(desc, "fields"):
            continue  # enum
        for _ in range(8):
            msg = rand_msg(desc)
            data = msg.SerializeToString()
            back = _class_for(desc)()
            back.ParseFromString(data)
            # drop explicitly-set default-empty repeateds: absent on wire
            want = {
                k: v for k, v in as_tree(msg).items() if v != []
            }
            gotv = as_tree(back)
            assert gotv == want, (full, want, gotv, data.hex())
            n_checked += 1
    assert n_checked >= 200
