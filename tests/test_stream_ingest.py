"""Streaming ingest (reference KafkaImporter / StreamInsert behavior:
ImportExport/KafkaImporter.cpp, RowToColumnLoader.cpp) — batched columnar
commits, rejected-row accounting, per-field transforms, file-tail source."""

import os

import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu.errors import SqlError
from heavydb_tpu.io.stream import FileTailSource, KafkaSource


@pytest.fixture()
def db():
    return hdt.connect()


def test_push_delimited_batches(db):
    db.sql("CREATE TABLE s1 (a INT, b DOUBLE, c TEXT)")
    imp = db.stream_importer("s1", batch_size=3)
    imp.push_delimited([
        "1,1.5,x", "2,2.5,y", "3,3.5,z",     # full batch → auto-flush
        "4,4.5,w",
    ])
    assert imp.stats.batches == 1  # second batch still buffered
    st = imp.close()
    assert st.batches == 2 and st.rows_loaded == 4 and st.rows_rejected == 0
    rows = db.sql("SELECT a, b, c FROM s1 ORDER BY a").rows()
    assert rows == [(1, 1.5, "x"), (2, 2.5, "y"), (3, 3.5, "z"), (4, 4.5, "w")]


def test_rejects_and_nulls(db):
    db.sql("CREATE TABLE s2 (a INT, b TEXT)")
    imp = db.stream_importer("s2", batch_size=100)
    imp.push_delimited([
        "1,ok",
        "nope,bad-int",      # reject: int parse
        "2,with,comma",      # reject: arity
        r"\N,nulled",        # NULL a
        "3,",                # empty → NULL b
    ])
    st = imp.close()
    assert st.rows_loaded == 3 and st.rows_rejected == 2
    assert len(st.rejected_samples) == 2
    rows = db.sql("SELECT a, b FROM s2 ORDER BY a NULLS FIRST").rows()
    assert rows == [(None, "nulled"), (1, "ok"), (3, None)]


def test_max_reject_aborts(db):
    db.sql("CREATE TABLE s3 (a INT)")
    imp = db.stream_importer("s3", batch_size=10, max_reject=2)
    with pytest.raises(SqlError, match="max_reject"):
        imp.push_delimited(["x", "y", "z"])


def test_transforms(db):
    db.sql("CREATE TABLE s4 (a INT, b TEXT)")
    imp = db.stream_importer(
        "s4", transforms={"b": (r"^raw:", ""), "a": (r"#", "")}
    )
    imp.push_delimited(["#1,raw:hello", "#2,raw:world"])
    imp.close()
    assert db.sql("SELECT a, b FROM s4 ORDER BY a").rows() == [
        (1, "hello"), (2, "world")
    ]


def test_typed_rows_and_epoch_per_batch(db):
    db.sql("CREATE TABLE s5 (a INT, b BOOLEAN)")
    imp = db.stream_importer("s5", batch_size=2)
    imp.push_rows([(1, True), (2, False), (3, None)])
    st = imp.close()
    assert st.batches == 2
    rows = db.sql("SELECT a, b FROM s5 ORDER BY a").rows()
    assert rows == [(1, True), (2, False), (3, None)]


def test_file_tail_source(db, tmp_path):
    db.sql("CREATE TABLE s6 (a INT, v DOUBLE)")
    p = str(tmp_path / "feed.csv")
    with open(p, "w") as fh:
        fh.write("1,0.5\n2,1.5\n")
        fh.write("3,")  # partial line must NOT be consumed yet
    src = FileTailSource(p)
    imp = db.stream_importer("s6", batch_size=100)
    lines = src.poll(0.1)
    assert lines == ["1,0.5", "2,1.5"]
    imp.push_delimited(lines)
    with open(p, "a") as fh:
        fh.write("2.5\n4,3.5\n")  # completes row 3, adds row 4
    imp.run(src, poll_timeout_s=0.05, idle_limit=2)
    assert db.sql("SELECT count(*), sum(a) FROM s6").rows() == [(4, 10)]


def test_kafka_source_gated(db):
    with pytest.raises(SqlError, match="consumer"):
        KafkaSource()

    class FakeMsg:
        def __init__(self, v):
            self._v = v

        def value(self):
            return self._v

        def error(self):
            return None

    class FakeConsumer:
        def __init__(self, batches):
            self.batches = list(batches)

        def poll(self, timeout):
            return FakeMsg(self.batches.pop(0)) if self.batches else None

    db.sql("CREATE TABLE s7 (a INT)")
    src = KafkaSource(consumer=FakeConsumer([b"1\n2\n", b"3\n"]))
    imp = db.stream_importer("s7", batch_size=10)
    imp.run(src, poll_timeout_s=0.01, idle_limit=1)
    assert db.sql("SELECT count(*), sum(a) FROM s7").rows() == [(3, 6)]


class _FakeKafkaMessage:
    """Mimics confluent_kafka.Message: .value() bytes, .error() None."""

    def __init__(self, value: bytes, error=None):
        self._v = value
        self._e = error

    def value(self):
        return self._v

    def error(self):
        return self._e


class _FakeKafkaBroker:
    """In-process stand-in for a Kafka topic partition: producers append
    records; consumers poll them in offset order with consumer-group
    offset tracking — enough protocol surface to integration-test
    KafkaSource + StreamImporter end-to-end without librdkafka
    (reference KafkaImporter.cpp consumes the same way: poll loop,
    error-frame skipping, offset resume)."""

    def __init__(self):
        self.log = []

    def produce(self, value):
        self.log.append(value if isinstance(value, bytes)
                        else value.encode())

    def consumer(self, group: str = "g0", start_offset: int = 0):
        return _FakeKafkaConsumer(self, start_offset)


class _FakeKafkaConsumer:
    def __init__(self, broker, offset):
        self.broker = broker
        self.offset = offset

    def poll(self, timeout_s):
        if self.offset >= len(self.broker.log):
            return None
        m = _FakeKafkaMessage(self.broker.log[self.offset])
        self.offset += 1
        return m


def test_kafka_adapter_against_fake_broker(db):
    db.sql("CREATE TABLE ks (a INT, v DOUBLE, s TEXT)")
    broker = _FakeKafkaBroker()
    broker.produce("1,0.5,x\n2,1.5,y")   # multi-line message
    broker.produce(b"3,2.5,z")
    src = KafkaSource(consumer=broker.consumer())
    imp = db.stream_importer("ks", batch_size=2)
    imp.run(src, poll_timeout_s=0.02, idle_limit=2)
    assert db.sql("SELECT count(*), sum(a) FROM ks").rows() == [(3, 6)]
    # late-arriving records resume from the committed offset
    broker.produce("4,3.5,w")
    src2 = KafkaSource(consumer=broker.consumer(start_offset=2))
    imp2 = db.stream_importer("ks", batch_size=10)
    imp2.run(src2, poll_timeout_s=0.02, idle_limit=2)
    assert db.sql("SELECT count(*), sum(a) FROM ks").rows() == [(4, 10)]


def test_kafka_adapter_error_frames_skipped(db):
    db.sql("CREATE TABLE ke (a INT)")
    broker = _FakeKafkaBroker()
    broker.produce("10")

    class _ErrConsumer:
        def __init__(self):
            self.n = 0

        def poll(self, timeout_s):
            self.n += 1
            if self.n == 1:
                return _FakeKafkaMessage(b"", error="transport error")
            if self.n == 2:
                return _FakeKafkaMessage(b"20\n30")
            return None

    src = KafkaSource(consumer=_ErrConsumer())
    imp = db.stream_importer("ke", batch_size=10)
    imp.run(src, poll_timeout_s=0.02, idle_limit=2)
    assert db.sql("SELECT sum(a) FROM ke").rows() == [(50,)]
