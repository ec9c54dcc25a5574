"""Kafka streaming reader.

Counterpart of /root/reference/tzrec/datasets/kafka_dataset.py (568 LoC):
per-partition offset checkpointing (resume at offset+1, reference
:351-362), start-timestamp seek via offsets_for_times (:99-163), and an
event-time column feeding checkpoint triggers. Requires confluent-kafka
(librdkafka); the class registers regardless and raises a clear error
at construction when the wheel is absent.

Input path format: ``kafka://broker1,broker2/topic`` with optional
``?group=...&start_ts=...`` query args. Messages are json or csv rows
parsed into Arrow columns per poll window.
"""

import json
import urllib.parse
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from torcheasyrec_tpu.datasets.dataset import BaseReader
from torcheasyrec_tpu.datasets.utils import DATA_TIMESTAMP
from torcheasyrec_tpu.utils.logging_util import logger

try:
    import confluent_kafka  # noqa: F401

    _HAS_KAFKA = True
except ImportError:
    _HAS_KAFKA = False


class KafkaReader(BaseReader):
    def __init__(
        self,
        input_path: str,
        batch_size: int,
        selected_cols: Optional[List[str]] = None,
        poll_timeout: float = 1.0,
        max_poll_records: int = 4096,
        **kwargs: Any,
    ) -> None:
        super().__init__(input_path, batch_size, selected_cols, **kwargs)
        if not _HAS_KAFKA:
            raise ImportError(
                "confluent-kafka is required for KafkaDataset; it is not "
                "installed in this environment"
            )
        parsed = urllib.parse.urlparse(input_path)
        assert parsed.scheme == "kafka", input_path
        self._brokers = parsed.netloc
        self._topic = parsed.path.lstrip("/")
        qs = urllib.parse.parse_qs(parsed.query)
        self._group = qs.get("group", ["tzrec-tpu"])[0]
        self._start_ts = int(qs.get("start_ts", [0])[0])
        self._poll_timeout = poll_timeout
        self._max_poll = max_poll_records
        # resume state: partition -> last consumed offset
        self._offsets: Dict[int, int] = {}

    def load_state(self, state: Dict[int, int]) -> None:
        self._offsets = dict(state or {})

    def _make_consumer(self):
        from confluent_kafka import Consumer, TopicPartition

        c = Consumer({
            "bootstrap.servers": self._brokers,
            "group.id": self._group,
            "enable.auto.commit": False,
            "auto.offset.reset": "earliest",
        })
        md = c.list_topics(self._topic, timeout=10)
        partitions = list(md.topics[self._topic].partitions)
        tps = []
        for p in partitions:
            if p in self._offsets:
                # resume at checkpointed offset + 1 (reference :351-362)
                tps.append(
                    TopicPartition(self._topic, p, self._offsets[p] + 1)
                )
            elif self._start_ts:
                tps.append(TopicPartition(self._topic, p, self._start_ts))
            else:
                tps.append(TopicPartition(self._topic, p))
        if self._start_ts and not self._offsets:
            tps = c.offsets_for_times(tps, timeout=10)
        c.assign(tps)
        return c

    def _iter_record_batches(
        self, worker_id: int, num_workers: int
    ) -> Iterator[Tuple[int, int, pa.RecordBatch]]:
        consumer = self._make_consumer()
        rows: List[Dict[str, Any]] = []
        try:
            while True:
                msgs = consumer.consume(
                    num_messages=self._max_poll,
                    timeout=self._poll_timeout,
                )
                if not msgs:
                    if rows:
                        yield from self._emit(rows)
                        rows = []
                    continue
                for m in msgs:
                    if m.error():
                        logger.warning(f"kafka error: {m.error()}")
                        continue
                    row = self._parse(m.value())
                    if row is None:
                        continue
                    ts = m.timestamp()[1]
                    row[DATA_TIMESTAMP] = ts // 1000 if ts > 0 else 0
                    row["__kafka_partition__"] = m.partition()
                    row["__kafka_offset__"] = m.offset()
                    self._offsets[m.partition()] = m.offset()
                    rows.append(row)
                if len(rows) >= self._batch_size:
                    yield from self._emit(rows)
                    rows = []
        finally:
            consumer.close()

    def _parse(self, value: bytes) -> Optional[Dict[str, Any]]:
        try:
            return json.loads(value)
        except (json.JSONDecodeError, UnicodeDecodeError):
            return None

    def _emit(self, rows) -> Iterator[Tuple[int, int, pa.RecordBatch]]:
        """Group by partition and carry REAL per-message offsets so
        checkpoint_info records resumable positions even with
        interleaved partitions or offset gaps (compacted topics)."""
        by_part: Dict[int, list] = {}
        for r in rows:
            by_part.setdefault(int(r.get("__kafka_partition__", 0)),
                               []).append(r)
        for partition, part_rows in by_part.items():
            cols: Dict[str, list] = {}
            for r in part_rows:
                for k, v in r.items():
                    if k == "__kafka_partition__":
                        continue
                    cols.setdefault(k, []).append(v)
            rb = pa.RecordBatch.from_pydict(
                {k: pa.array(v) for k, v in cols.items()}
            )
            yield partition, int(part_rows[0]["__kafka_offset__"]), rb

    def _inject_ckpt_cols(self, rb, source_id, start_row):
        """Override: the real kafka offsets ride in __kafka_offset__;
        BaseReader's arange would fabricate wrong resume positions."""
        import numpy as _np

        from torcheasyrec_tpu.datasets.utils import (
            CKPT_ROW_IDX,
            CKPT_SOURCE_ID,
        )

        n = rb.num_rows
        offsets = rb.column(
            rb.schema.get_field_index("__kafka_offset__")
        )
        rb = rb.drop_columns(["__kafka_offset__"])
        from torcheasyrec_tpu.datasets.utils import pa_from_numpy

        rb = rb.append_column(
            CKPT_SOURCE_ID, pa_from_numpy(_np.full(n, source_id, _np.int64))
        )
        rb = rb.append_column(CKPT_ROW_IDX, offsets.cast(pa.int64()))
        return rb
