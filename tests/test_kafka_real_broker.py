"""CI-optional REAL-broker Kafka lane.

The unit lane (test_kafka_dataset.py) drives KafkaReader's actual
consumer code path (_make_consumer / assign / offsets_for_times /
consume) against an in-memory confluent_kafka emulation. This module
exercises the same path against genuine librdkafka + a live broker —
it runs only where both exist:

  TZREC_KAFKA_BROKER=host:9092 pytest tests/test_kafka_real_broker.py

(confluent-kafka is not installed in the default container; the lane
self-skips. Reference analogue: broker-fixture tests for
/root/reference/tzrec/datasets/kafka_dataset.py:99-163,351-362.)
"""

import json
import os
import time
import uuid

import numpy as np
import pytest

BROKER = os.environ.get("TZREC_KAFKA_BROKER", "")

try:
    import confluent_kafka

    _HAS_KAFKA = True
except ImportError:
    _HAS_KAFKA = False

pytestmark = pytest.mark.skipif(
    not (BROKER and _HAS_KAFKA),
    reason="needs TZREC_KAFKA_BROKER and the confluent-kafka wheel",
)


@pytest.fixture(scope="module")
def topic():
    """Create a fresh 2-partition topic and produce 80 json rows."""
    from confluent_kafka.admin import AdminClient, NewTopic

    name = f"tzrec-test-{uuid.uuid4().hex[:8]}"
    admin = AdminClient({"bootstrap.servers": BROKER})
    admin.create_topics([NewTopic(name, num_partitions=2)])[name].result(30)
    prod = confluent_kafka.Producer({"bootstrap.servers": BROKER})
    for p in range(2):
        for i in range(40):
            prod.produce(
                name,
                partition=p,
                value=json.dumps(
                    {"user_id": p * 1000 + i, "label": float(i % 2)}
                ).encode(),
                timestamp=1_700_000_000_000 + i * 1000,
            )
    prod.flush(30)
    yield name
    admin.delete_topics([name])


def test_stream_and_offset_resume(topic):
    from torcheasyrec_tpu.datasets.kafka_dataset import KafkaReader
    from torcheasyrec_tpu.datasets.utils import CKPT_ROW_IDX

    reader = KafkaReader(
        f"kafka://{BROKER}/{topic}?group=g-{uuid.uuid4().hex[:6]}",
        batch_size=16,
    )
    it = reader.to_batches()
    got = [next(it) for _ in range(3)]
    it.close()
    assert sum(len(b["user_id"]) for b in got) == 48
    assert set(reader._offsets)  # per-partition positions tracked

    # resume: a checkpoint at offset 14 of partition 0 restarts at 15
    r2 = KafkaReader(
        f"kafka://{BROKER}/{topic}?group=g-{uuid.uuid4().hex[:6]}",
        batch_size=10,
    )
    r2.load_state({0: 14, 1: 39})  # partition 1 fully consumed
    it = r2.to_batches()
    batch = next(it)
    it.close()
    uid = np.asarray(batch["user_id"].to_pylist())
    np.testing.assert_array_equal(uid, np.arange(15, 25))
    off = np.asarray(batch[CKPT_ROW_IDX].to_pylist())
    np.testing.assert_array_equal(off, np.arange(15, 25))


def test_start_ts_seek(topic):
    from torcheasyrec_tpu.datasets.kafka_dataset import KafkaReader

    start = 1_700_000_000_000 + 20 * 1000
    reader = KafkaReader(
        f"kafka://{BROKER}/{topic}?group=g-{uuid.uuid4().hex[:6]}"
        f"&start_ts={start}",
        batch_size=10,
    )
    it = reader.to_batches()
    batch = next(it)
    it.close()
    uid = np.asarray(batch["user_id"].to_pylist()) % 1000
    assert (uid >= 20).all()
