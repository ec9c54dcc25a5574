"""KafkaReader against a faked confluent-kafka consumer.

Counterpart of the reference's broker-fixture kafka tests
(/root/reference/tzrec/datasets/kafka_dataset.py:99-163,351-362 —
offset resume, start-timestamp seek, streaming batch assembly), here
with an in-memory consumer so no broker is needed.
"""

import json
import sys
import types

import numpy as np
import pytest

from torcheasyrec_tpu.datasets import kafka_dataset
from torcheasyrec_tpu.datasets.utils import (
    CKPT_ROW_IDX,
    CKPT_SOURCE_ID,
    DATA_TIMESTAMP,
)

# --------------------------------------------------------- fake librdkafka

_OFFSET_INVALID = -1001


class _FakeMessage:
    def __init__(self, partition, offset, ts_ms, value):
        self._p, self._o, self._ts, self._v = partition, offset, ts_ms, value

    def error(self):
        return None

    def value(self):
        return self._v

    def timestamp(self):
        return (1, self._ts)

    def partition(self):
        return self._p

    def offset(self):
        return self._o


class _FakeTopicPartition:
    def __init__(self, topic, partition, offset=_OFFSET_INVALID):
        self.topic, self.partition, self.offset = topic, partition, offset


class _FakeConsumer:
    """Round-robin in-memory consumer over {partition: [(off, ts, val)]}."""

    topics = {}

    def __init__(self, conf):
        self.conf = conf
        self.assigned = []
        self.closed = False
        self._cursors = {}

    def list_topics(self, topic, timeout=None):
        parts = {p: None for p in type(self).topics[topic]}
        meta = types.SimpleNamespace(
            topics={topic: types.SimpleNamespace(partitions=parts)}
        )
        return meta

    def offsets_for_times(self, tps, timeout=None):
        out = []
        for tp in tps:
            msgs = type(self).topics[tp.topic][tp.partition]
            # first offset whose timestamp >= requested ts
            off = next(
                (o for o, ts, _ in msgs if ts >= tp.offset), msgs[-1][0] + 1
            )
            out.append(_FakeTopicPartition(tp.topic, tp.partition, off))
        return out

    def assign(self, tps):
        self.assigned = list(tps)
        for tp in tps:
            msgs = type(self).topics[tp.topic][tp.partition]
            if tp.offset == _OFFSET_INVALID:
                pos = 0  # auto.offset.reset=earliest
            else:
                pos = next(
                    (i for i, (o, _, _) in enumerate(msgs)
                     if o >= tp.offset),
                    len(msgs),
                )
            self._cursors[(tp.topic, tp.partition)] = pos

    def consume(self, num_messages, timeout=None):
        out = []
        for (topic, part), pos in sorted(self._cursors.items()):
            msgs = type(self).topics[topic][part]
            take = msgs[pos : pos + num_messages - len(out)]
            self._cursors[(topic, part)] = pos + len(take)
            out.extend(
                _FakeMessage(part, o, ts, v) for o, ts, v in take
            )
            if len(out) >= num_messages:
                break
        return out

    def close(self):
        self.closed = True


@pytest.fixture()
def fake_kafka(monkeypatch):
    mod = types.ModuleType("confluent_kafka")
    mod.Consumer = _FakeConsumer
    mod.TopicPartition = _FakeTopicPartition
    monkeypatch.setitem(sys.modules, "confluent_kafka", mod)
    monkeypatch.setattr(kafka_dataset, "_HAS_KAFKA", True)
    _FakeConsumer.topics = {}
    return _FakeConsumer


def _fill_topic(fake, topic, per_part=40, parts=2, gap_at=None):
    data = {}
    for p in range(parts):
        msgs = []
        off = 0
        for i in range(per_part):
            if gap_at is not None and i == gap_at:
                off += 3  # compacted-topic offset gap
            val = json.dumps(
                {"user_id": p * 1000 + i, "label": float(i % 2)}
            ).encode()
            msgs.append((off, 1_700_000_000_000 + i * 1000, val))
            off += 1
        data[p] = msgs
    fake.topics[topic] = data
    return data


def _take_batches(reader, n_batches):
    out = []
    it = reader.to_batches()
    for _ in range(n_batches):
        out.append(next(it))
    it.close()
    return out


def test_kafka_stream_parse_and_ckpt_cols(fake_kafka):
    _fill_topic(fake_kafka, "events", per_part=40, parts=2)
    reader = kafka_dataset.KafkaReader(
        "kafka://b1,b2/events?group=g1", batch_size=16
    )
    batches = _take_batches(reader, 4)
    total = 0
    for b in batches:
        n = len(b["user_id"])
        assert n == 16
        total += n
        assert DATA_TIMESTAMP in b and CKPT_ROW_IDX in b
        # event-time column is seconds
        ts = np.asarray(b[DATA_TIMESTAMP].to_pylist())
        assert (ts >= 1_700_000_000).all()
        # resume positions are REAL kafka offsets per row
        src = np.asarray(b[CKPT_SOURCE_ID].to_pylist())
        off = np.asarray(b[CKPT_ROW_IDX].to_pylist())
        uid = np.asarray(b["user_id"].to_pylist())
        np.testing.assert_array_equal(uid // 1000, src)
        np.testing.assert_array_equal(uid % 1000, off)
    assert total == 64
    # reader tracked the last consumed offset per partition
    assert set(reader._offsets) == {0, 1}


def test_kafka_resume_skips_consumed_offsets(fake_kafka):
    _fill_topic(fake_kafka, "events", per_part=30, parts=1)
    reader = kafka_dataset.KafkaReader(
        "kafka://b/events", batch_size=10
    )
    # checkpoint says offset 14 was consumed -> resume at 15
    reader.load_state({0: 14})
    (batch,) = _take_batches(reader, 1)
    uid = np.asarray(batch["user_id"].to_pylist())
    np.testing.assert_array_equal(uid, np.arange(15, 25))


def test_kafka_resume_with_offset_gaps(fake_kafka):
    """Compacted topics have holes; resume must honor the real offsets."""
    data = _fill_topic(fake_kafka, "events", per_part=30, parts=1, gap_at=10)
    offsets = [o for o, _, _ in data[0]]
    assert offsets[10] == 13  # the gap exists
    reader = kafka_dataset.KafkaReader("kafka://b/events", batch_size=8)
    reader.load_state({0: 12})  # last consumed before the gap
    (batch,) = _take_batches(reader, 1)
    off = np.asarray(batch[CKPT_ROW_IDX].to_pylist())
    np.testing.assert_array_equal(off, offsets[10:18])


def test_kafka_start_ts_seek(fake_kafka):
    _fill_topic(fake_kafka, "events", per_part=30, parts=2)
    # messages are 1s apart starting at 1_700_000_000_000
    start = 1_700_000_000_000 + 20 * 1000
    reader = kafka_dataset.KafkaReader(
        f"kafka://b/events?start_ts={start}", batch_size=10
    )
    (batch,) = _take_batches(reader, 1)
    uid = np.asarray(batch["user_id"].to_pylist()) % 1000
    assert (uid >= 20).all()


def test_kafka_missing_wheel_raises(monkeypatch):
    monkeypatch.setattr(kafka_dataset, "_HAS_KAFKA", False)
    with pytest.raises(ImportError, match="confluent-kafka"):
        kafka_dataset.KafkaReader("kafka://b/t", batch_size=8)


def test_kafka_message_errors_skipped(fake_kafka):
    """librdkafka delivers broker errors as messages whose error() is
    set (e.g. _PARTITION_EOF); the reader must skip them, not parse."""
    _fill_topic(fake_kafka, "events", per_part=4, parts=1)

    class _ErrMessage(_FakeMessage):
        def error(self):
            return types.SimpleNamespace(
                code=lambda: 3, str=lambda: "_PARTITION_EOF"
            )

    real_consume = _FakeConsumer.consume

    def consume_with_errors(self, num_messages, timeout=None):
        msgs = real_consume(self, num_messages, timeout)
        return [_ErrMessage(0, -1, 0, b"")] + msgs

    fake_kafka.consume = consume_with_errors
    try:
        reader = kafka_dataset.KafkaReader("kafka://b/events", batch_size=4)
        (batch,) = _take_batches(reader, 1)
        np.testing.assert_array_equal(
            np.asarray(batch["user_id"].to_pylist()), [0, 1, 2, 3]
        )
    finally:
        fake_kafka.consume = real_consume


def test_kafka_bad_json_skipped(fake_kafka):
    fake_kafka.topics["events"] = {0: [
        (0, 1_700_000_000_000, b"not json"),
        (1, 1_700_000_001_000, json.dumps({"user_id": 7,
                                           "label": 1.0}).encode()),
        (2, 1_700_000_002_000, json.dumps({"user_id": 8,
                                           "label": 0.0}).encode()),
    ]}
    reader = kafka_dataset.KafkaReader("kafka://b/events", batch_size=2)
    (batch,) = _take_batches(reader, 1)
    np.testing.assert_array_equal(
        np.asarray(batch["user_id"].to_pylist()), [7, 8]
    )
