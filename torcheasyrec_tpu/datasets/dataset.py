"""Dataset / Reader / Writer registries and the dataloader.

Counterpart of /root/reference/tzrec/datasets/dataset.py (BaseDataset:88,
BaseReader:508, BaseWriter:643, create_dataloader:753). Host-side:
readers buffer Arrow record batches, slice them into fixed-size batches
(with shuffle-buffer support), inject checkpoint-position columns
(__ckpt_source_id__/__ckpt_row_idx__, reference datasets/utils.py:39-71),
run the negative sampler, and parse into static-shape numpy Batches. A
background prefetch thread replaces the torch DataLoader worker pool
(pyarrow releases the GIL on IO/compute).
"""

import queue
import random
import threading
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from torcheasyrec_tpu.datasets.data_parser import DataParser
from torcheasyrec_tpu.datasets.utils import (
    CKPT_ROW_IDX,
    CKPT_SOURCE_ID,
    DATA_TIMESTAMP,
    HARD_NEG_INDICES,
    Batch,
    BatchInfo,
    pa_from_numpy,
)
from torcheasyrec_tpu.features.feature import BaseFeature
from torcheasyrec_tpu.utils.load_class import get_register_class_meta
from torcheasyrec_tpu.utils.logging_util import logger

_READER_CLASS_MAP: Dict[str, type] = {}
_WRITER_CLASS_MAP: Dict[str, type] = {}
_DATASET_CLASS_MAP: Dict[str, type] = {}

_reader_meta = get_register_class_meta(_READER_CLASS_MAP)
_writer_meta = get_register_class_meta(_WRITER_CLASS_MAP)
_dataset_meta = get_register_class_meta(_DATASET_CLASS_MAP)


class BaseReader(metaclass=_reader_meta):
    """Buffered reader over one or more input sources."""

    def __init__(
        self,
        input_path: str,
        batch_size: int,
        selected_cols: Optional[List[str]] = None,
        drop_remainder: bool = False,
        shuffle: bool = False,
        shuffle_buffer_size: int = 32,
        sample_cost_field: Optional[str] = None,
        batch_cost_size: int = 0,
        **kwargs: Any,
    ) -> None:
        self._input_path = input_path
        self._batch_size = batch_size
        self._selected_cols = selected_cols
        self._drop_remainder = drop_remainder
        self._shuffle = shuffle
        self._shuffle_buffer_size = shuffle_buffer_size
        # cost-based batch slicing (reference dataset.py:569-587 +
        # data.proto batch_cost_size): cap sum(cost) per batch
        self._sample_cost_field = sample_cost_field
        self._batch_cost_size = int(batch_cost_size or 0)
        # resume state: source_id -> rows already consumed
        self._resume_state: Dict[int, int] = {}

    def load_state(self, state: Dict[int, int]) -> None:
        self._resume_state = dict(state or {})

    def schema(self) -> pa.Schema:
        raise NotImplementedError

    def num_files(self) -> int:
        return 1

    def _iter_record_batches(
        self, worker_id: int, num_workers: int
    ) -> Iterator[Tuple[int, int, pa.RecordBatch]]:
        """Yield (source_id, start_row, record_batch)."""
        raise NotImplementedError

    def to_batches(
        self, worker_id: int = 0, num_workers: int = 1
    ) -> Iterator[Dict[str, pa.Array]]:
        """Yield fixed-size column dicts with ckpt columns injected
        (buffer/slice logic mirrors reference dataset.py:569-587)."""
        buf: List[pa.RecordBatch] = []
        buffered = 0
        shuffle_pool: List[pa.RecordBatch] = []
        rng = random.Random(worker_id)

        def _cost_rows(tbl) -> int:
            """Rows fitting the batch cost budget (else batch_size)."""
            if not (self._batch_cost_size and self._sample_cost_field
                    and self._sample_cost_field in tbl.schema.names):
                return self._batch_size
            costs = tbl.column(self._sample_cost_field).to_numpy(
                zero_copy_only=False
            )[: self._batch_size]
            cum = np.cumsum(np.nan_to_num(costs.astype(np.float64)))
            n = int(np.searchsorted(cum, self._batch_cost_size,
                                    side="right"))
            return max(min(n, self._batch_size), 1)

        def _slice_out() -> Iterator[Dict[str, pa.Array]]:
            nonlocal buf, buffered
            while buffered >= self._batch_size:
                tbl = pa.Table.from_batches(buf)
                take = _cost_rows(tbl)
                head = tbl.slice(0, take)
                rest = tbl.slice(take)
                buf = rest.combine_chunks().to_batches()
                buffered = rest.num_rows
                yield {
                    name: head.column(i)
                    for i, name in enumerate(head.schema.names)
                }

        # resume positions apply only to the FIRST pass after restore;
        # later epochs must replay the full source
        resume, self._resume_state = self._resume_state, {}
        for source_id, start_row, rb in self._iter_record_batches(
            worker_id, num_workers
        ):
            consumed = resume.get(source_id, -1)
            if start_row + rb.num_rows <= consumed + 1:
                continue
            if start_row <= consumed:
                skip = consumed + 1 - start_row
                rb = rb.slice(skip)
                start_row += skip
            rb = self._inject_ckpt_cols(rb, source_id, start_row)
            if self._shuffle:
                shuffle_pool.append(rb)
                if len(shuffle_pool) >= self._shuffle_buffer_size:
                    rng.shuffle(shuffle_pool)
                    take = shuffle_pool.pop(0)
                    buf.append(take)
                    buffered += take.num_rows
                    yield from _slice_out()
            else:
                buf.append(rb)
                buffered += rb.num_rows
                yield from _slice_out()

        rng.shuffle(shuffle_pool)
        for rb in shuffle_pool:
            buf.append(rb)
            buffered += rb.num_rows
            yield from _slice_out()
        if buffered > 0 and not self._drop_remainder:
            tbl = pa.Table.from_batches(buf)
            yield {
                name: tbl.column(i) for i, name in enumerate(tbl.schema.names)
            }

    def _inject_ckpt_cols(
        self, rb: pa.RecordBatch, source_id: int, start_row: int
    ) -> pa.RecordBatch:
        n = rb.num_rows
        rb = rb.append_column(
            CKPT_SOURCE_ID, pa_from_numpy(np.full(n, source_id, np.int64))
        )
        rb = rb.append_column(
            CKPT_ROW_IDX,
            pa_from_numpy(
                np.arange(start_row, start_row + n, dtype=np.int64)
            ),
        )
        return rb


class BaseWriter(metaclass=_writer_meta):
    def __init__(self, output_path: str, **kwargs: Any) -> None:
        self._output_path = output_path
        self._lock = threading.Lock()

    def write(self, output_dict: Dict[str, pa.Array]) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class BaseDataset(metaclass=_dataset_meta):
    _reserved_columns: List[str] = []
    """Iterable over (Batch, BatchInfo)."""

    def __init__(
        self,
        data_config: Any,
        features: List[BaseFeature],
        input_path: str,
        reader: BaseReader,
        mode: str = "train",
        sampler: Optional[Any] = None,
        debug_level: int = 0,
        worker_id: int = 0,
        num_workers: int = 1,
    ) -> None:
        self._data_config = data_config
        self._features = features
        self._input_path = input_path
        self._reader = reader
        self._mode = mode
        self._sampler = sampler
        # process-level input shard (reference slices per rank/worker,
        # tzrec/datasets/dataset.py:799-814): each jax process reads a
        # disjoint slice so multi-host training never duplicates rows
        self._worker_id = worker_id
        self._num_workers = num_workers
        import os as _os

        self._parser = DataParser(
            features,
            labels=list(data_config.label_fields) if mode != "predict" else [],
            sample_weights=list(data_config.sample_weight_fields),
            is_training=(mode == "train"),
            force_base_data_group=data_config.force_base_data_group,
            input_tile=(
                mode == "predict"
                and _os.environ.get("INPUT_TILE", "") in ("2", "3")
            ),
            fg_threads=int(getattr(data_config, "fg_threads", 1) or 1),
        )

    @property
    def parser(self) -> DataParser:
        return self._parser

    def load_state_dict(self, state: Dict[int, int]) -> None:
        self._reader.load_state(state)

    def __iter__(self) -> Iterator[Tuple[Batch, BatchInfo]]:
        if self._sampler is not None:
            self._sampler.init()
        for columns in self._reader.to_batches(
            worker_id=self._worker_id, num_workers=self._num_workers
        ):
            yield self._build_batch(columns)

    def _build_batch(
        self, columns: Dict[str, pa.Array]
    ) -> Tuple[Batch, BatchInfo]:
        info = BatchInfo()
        # pop ckpt metadata (reference dataset.py:322-337)
        if CKPT_SOURCE_ID in columns:
            sid = columns.pop(CKPT_SOURCE_ID)
            ridx = columns.pop(CKPT_ROW_IDX)
            sid_np = sid.to_numpy(zero_copy_only=False)
            ridx_np = ridx.to_numpy(zero_copy_only=False)
            for s in np.unique(sid_np):
                info.checkpoint_info[int(s)] = int(ridx_np[sid_np == s].max())
        if DATA_TIMESTAMP in columns:
            ts = columns.pop(DATA_TIMESTAMP).to_numpy(zero_copy_only=False)
            if len(ts):
                # max consumed event time drives event-time ckpt triggers
                info.data_timestamp = int(np.max(ts))
        for col in self._reserved_columns:
            if col in columns:
                info.reserved[col] = columns[col]
        n_rows = len(next(iter(columns.values())))
        info.batch_size = n_rows

        # sample masking (reference dataset.py:348-355)
        mask_prob = self._data_config.sample_mask_prob
        if self._mode == "train" and mask_prob > 0:
            pass  # feature-level masking is applied by use_mask features

        # run negative sampler (reference dataset.py:390-464)
        hard_neg_indices = None
        if self._sampler is not None:
            columns = self._sampler.process(columns)
            hard_neg_indices = columns.pop(HARD_NEG_INDICES, None)

        batch = self._parser.parse_to_batch(columns, info)
        if hard_neg_indices is not None:
            batch.additional["hard_neg_indices"] = hard_neg_indices
        return batch, info


class PrefetchIterator:
    """Background-thread prefetch of (Batch, BatchInfo) items.

    When ``device_put_fn`` is set, batches are transferred to device at
    ``__next__`` on the CONSUMER thread (async dispatch — the copy still
    overlaps the previous step's compute, replacing the reference
    pipeline's copy-on-side-stream, dist_util.py:266-272). Running it in
    the prefetch thread instead serializes H2D dispatch behind parsing
    under the GIL and costs ~25%% pipeline throughput.
    """

    def __init__(self, iterable, prefetch: int = 4,
                 device_put_fn=None) -> None:
        self._device_put_fn = device_put_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def _worker() -> None:
            try:
                for item in iterable:
                    if self._stop.is_set():
                        return
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # noqa: BLE001
                self._err = e
            finally:
                # the done sentinel must not be lost to a full queue
                while not self._stop.is_set():
                    try:
                        self._q.put(self._done, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=_worker, daemon=True)
        self._t.start()

    def close(self) -> None:
        """Stop the worker and drop queued batches (safe on an
        abandoned iterator — the thread never blocks forever on put)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        if getattr(self, "_finished", False):
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            self._finished = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        if self._device_put_fn is not None:
            item = (self._device_put_fn(item[0]), item[1])
        return item


def create_reader(
    input_path: str,
    batch_size: int,
    selected_cols: Optional[List[str]] = None,
    dataset_type: Optional[int] = None,
    **kwargs: Any,
) -> BaseReader:
    from torcheasyrec_tpu.protos import data_pb2

    name = data_pb2.DatasetType.Name(dataset_type or _infer_type(input_path))
    reader_name = name.replace("Dataset", "Reader")
    cls = _READER_CLASS_MAP.get(reader_name)
    if cls is None:
        raise ValueError(
            f"no reader for {name}; available {sorted(_READER_CLASS_MAP)}"
        )
    return cls(input_path, batch_size, selected_cols, **kwargs)


def create_writer(output_path: str, writer_type: str, **kwargs: Any) -> BaseWriter:
    cls = _WRITER_CLASS_MAP.get(writer_type)
    if cls is None:
        raise ValueError(
            f"no writer {writer_type}; available {sorted(_WRITER_CLASS_MAP)}"
        )
    return cls(output_path, **kwargs)


def _infer_type(input_path: str) -> int:
    from torcheasyrec_tpu.protos import data_pb2

    if input_path.endswith(".csv") or ".csv" in input_path:
        return data_pb2.DatasetType.CsvDataset
    return data_pb2.DatasetType.ParquetDataset


def _reader_for(
    data_config, input_path: str, batch_size: int, selected_cols, mode: str,
    resume_state=None,
) -> BaseReader:
    """The ONE place reader construction options are derived from a
    data_config — used by both the in-process loader and mp workers so
    the two paths cannot drift."""
    r = create_reader(
        input_path,
        batch_size,
        selected_cols=selected_cols,
        dataset_type=data_config.dataset_type,
        drop_remainder=data_config.drop_remainder or (mode == "train"),
        shuffle=data_config.shuffle and mode == "train",
        shuffle_buffer_size=data_config.shuffle_buffer_size,
        delimiter=data_config.delimiter,
        with_header=data_config.with_header,
        input_fields=list(data_config.input_fields),
        sample_cost_field=data_config.sample_cost_field or None,
        batch_cost_size=data_config.batch_cost_size,
    )
    if resume_state:
        r.load_state(resume_state)
    return r


class _MpDatasetFactory:
    """Picklable per-worker dataset builder for the mp loader.

    Spawn-safe: carries only protos, feature objects, sampler state and
    primitives (all pickle cleanly), so workers can be fresh
    interpreters — required when the parent has already initialized a
    non-CPU jax backend, where fork() inherits locked client mutexes.
    Worker w of k builds global shard (base_wid*k + w) of (base_nw*k):
    rows stay disjoint across both hosts and workers.
    """

    def __init__(
        self, data_config, features, input_path, mode, sampler,
        debug_level, reserved_columns, selected_cols, batch_size,
        base_wid, base_nw, k,
    ) -> None:
        self.data_config = data_config
        self.features = features
        self.input_path = input_path
        self.mode = mode
        self.sampler = sampler
        self.debug_level = debug_level
        self.reserved_columns = list(reserved_columns or [])
        self.selected_cols = selected_cols
        self.batch_size = batch_size
        self.base_wid = base_wid
        self.base_nw = base_nw
        self.k = k

    def __call__(self, w: int):
        reader = _reader_for(
            self.data_config, self.input_path, self.batch_size,
            self.selected_cols, self.mode,
        )
        ds = BaseDataset(
            self.data_config, self.features, self.input_path, reader,
            self.mode, self.sampler, self.debug_level,
            worker_id=self.base_wid * self.k + w,
            num_workers=self.base_nw * self.k,
        )
        ds._reserved_columns = self.reserved_columns
        return ds


def create_dataloader(
    data_config: Any,
    features: List[BaseFeature],
    input_path: str,
    mode: str = "train",
    reserved_columns: Optional[List[str]] = None,
    sampler_config: Optional[Any] = None,
    debug_level: int = 0,
    resume_state: Optional[Dict[int, int]] = None,
    prefetch: int = 4,
    worker_id: Optional[int] = None,
    num_workers: Optional[int] = None,
    pack_dense_bf16: bool = False,
    group_size: int = 1,
):
    """Build the (prefetching) dataset iterator factory.

    Returns a zero-arg callable producing a fresh iterator per epoch
    (replaces torch DataLoader + persistent workers,
    reference dataset.py:753-852). When ``data_config.num_workers`` is
    explicitly set (or TZREC_MP_LOADER=<n>), batches are produced by
    that many worker processes (datasets/mp_loader.py; fork or spawn,
    auto-detected) instead of a prefetch thread — each worker owns a
    disjoint input shard (process_index*K + w of process_count*K).
    """
    from torcheasyrec_tpu.protos import data_pb2

    batch_size = data_config.batch_size
    if mode != "train" and data_config.HasField("eval_batch_size"):
        batch_size = data_config.eval_batch_size

    selected_cols = _selected_columns(data_config, features, mode, reserved_columns)

    sampler = None
    sampler_type = data_config.WhichOneof("sampler")
    if sampler_type is not None and mode != "predict":
        from torcheasyrec_tpu.datasets import sampler as sampler_mod

        sampler_cfg = getattr(data_config, sampler_type)
        cls_name = type(sampler_cfg).__name__
        extra = {}
        if cls_name == "TDMSampler" and len(data_config.label_fields):
            extra["label_field"] = data_config.label_fields[0]
        # sequence mode: item_id_field names a grouped-sequence
        # sub-feature -> its column holds delim-joined positives per row
        for f in features:
            if (
                f.name == sampler_cfg.item_id_field
                and getattr(f, "sequence_name", None)
            ):
                extra["seq_delim"] = f.sequence_delim or ";"
                break
        sampler = sampler_mod.BaseSampler.create_class(cls_name)(
            sampler_cfg,
            fields=None,
            batch_size=batch_size,
            is_training=(mode == "train"),
            **extra,
        )

    reader = _reader_for(
        data_config, input_path, batch_size, selected_cols, mode,
        resume_state,
    )

    # default input shard = this jax process (multi-host: disjoint rows
    # per host; single-process: whole input)
    if worker_id is None or num_workers is None:
        import jax

        worker_id = jax.process_index()
        num_workers = jax.process_count()

    dataset = BaseDataset(
        data_config, features, input_path, reader, mode, sampler,
        debug_level, worker_id=worker_id, num_workers=num_workers,
    )
    dataset._reserved_columns = list(reserved_columns or [])

    from torcheasyrec_tpu.datasets.mp_loader import mp_loader_enabled

    mp_workers = mp_loader_enabled(data_config, mode)
    if sampler is not None and mp_workers > 1:
        # parse the item table ONCE per host and publish it in shared
        # memory; each worker's pickled sampler re-attaches instead of
        # re-parsing (reference: one graphlearn server per host,
        # sampler.py:322-335)
        sampler.prepare_shared()
    # mid-epoch resume replays ONE consumer-side watermark; pushing it
    # into K differently-lagged worker readers would skip rows a slower
    # worker never produced. The RESUMED epoch runs single-stream (the
    # reader already carries the loaded positions); fresh epochs after
    # it re-enable the worker pool.
    resumed_epoch_pending = [bool(resume_state) and mp_workers > 1]
    if resumed_epoch_pending[0]:
        logger.info(
            "mp loader deferred to the next epoch: the resumed epoch "
            "replays the single-stream dataloader watermark"
        )
    def _make_iter(device_put_fn=None):
        if mp_workers > 1 and not resumed_epoch_pending[0]:
            from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader

            factory = _MpDatasetFactory(
                data_config, features, input_path, mode, sampler,
                debug_level, reserved_columns, selected_cols, batch_size,
                worker_id, num_workers, mp_workers,
            )
            return MpBatchLoader(
                factory, mp_workers, dense_bf16=pack_dense_bf16,
                device_put_fn=device_put_fn,
                group_size=group_size,
            )
        resumed_epoch_pending[0] = False
        if group_size > 1:
            logger.warning(
                "steps_per_dispatch > 1 needs the multi-process loader "
                "(set data_config.num_workers); falling back to "
                "per-batch stepping for this epoch"
            )
        return PrefetchIterator(
            iter(dataset), prefetch=prefetch, device_put_fn=device_put_fn
        )

    _make_iter.dataset = dataset
    _make_iter.reader = reader
    _make_iter.mp_workers = mp_workers
    return _make_iter


def _selected_columns(
    data_config: Any,
    features: List[BaseFeature],
    mode: str,
    reserved: Optional[List[str]],
) -> List[str]:
    cols: List[str] = []
    for f in features:
        for c in f.inputs:
            if c not in cols:
                cols.append(c)
    if mode != "predict":
        for label in data_config.label_fields:
            if label not in cols:
                cols.append(label)
        for w in data_config.sample_weight_fields:
            if w not in cols:
                cols.append(w)
    if data_config.sample_cost_field and (
        data_config.sample_cost_field not in cols
    ):
        cols.append(data_config.sample_cost_field)
    for r in reserved or []:
        if r not in cols:
            cols.append(r)
    return cols
