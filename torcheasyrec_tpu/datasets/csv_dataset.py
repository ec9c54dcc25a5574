"""CSV reader/writer.

Counterpart of /root/reference/tzrec/datasets/csv_dataset.py (:31 reader,
:169 writer) with input_fields type overrides.
"""

import csv as _csv
import glob
import os
from typing import Any, Dict, Iterator, List, Optional, Tuple

import pyarrow as pa
import pyarrow.csv as pacsv

from torcheasyrec_tpu.datasets.dataset import BaseReader, BaseWriter

_FIELD_TYPE_TO_PA = {
    0: pa.int32(),     # INT32
    1: pa.int64(),     # INT64
    2: pa.string(),    # STRING
    3: pa.float32(),   # FLOAT
    4: pa.float64(),   # DOUBLE
}


class CsvReader(BaseReader):
    def __init__(
        self,
        input_path: str,
        batch_size: int,
        selected_cols: Optional[List[str]] = None,
        delimiter: str = ",",
        with_header: bool = False,
        input_fields: Optional[List[Any]] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(input_path, batch_size, selected_cols, **kwargs)
        self._delimiter = delimiter or ","
        self._with_header = with_header
        self._input_fields = input_fields or []
        paths: List[str] = []
        for part in input_path.split(","):
            part = part.strip()
            if not part:
                continue
            if os.path.isdir(part):
                paths.extend(sorted(glob.glob(os.path.join(part, "*.csv"))))
            elif any(ch in part for ch in "*?["):
                paths.extend(sorted(glob.glob(part)))
            else:
                paths.append(part)
        if not paths:
            raise FileNotFoundError(f"no csv files match {input_path}")
        self._paths = paths

    def _read_opts(self):
        column_names = None
        if not self._with_header:
            if not self._input_fields:
                raise ValueError(
                    "csv without header requires data_config.input_fields"
                )
            column_names = [f.input_name for f in self._input_fields]
        read_options = pacsv.ReadOptions(
            column_names=column_names, autogenerate_column_names=False
        )
        parse_options = pacsv.ParseOptions(delimiter=self._delimiter)
        column_types = {}
        for f in self._input_fields:
            if f.HasField("input_type"):
                column_types[f.input_name] = _FIELD_TYPE_TO_PA.get(
                    f.input_type, pa.string()
                )
        convert_options = pacsv.ConvertOptions(column_types=column_types)
        return read_options, parse_options, convert_options

    def schema(self) -> pa.Schema:
        ro, po, co = self._read_opts()
        with pacsv.open_csv(
            self._paths[0], read_options=ro, parse_options=po,
            convert_options=co,
        ) as reader:
            return reader.schema

    def num_files(self) -> int:
        return len(self._paths)

    def _iter_record_batches(
        self, worker_id: int, num_workers: int
    ) -> Iterator[Tuple[int, int, pa.RecordBatch]]:
        # whole-file shards when possible, else interleaved record
        # batches (parse cost is duplicated but rows stay disjoint)
        by_file = num_workers <= 1 or len(self._paths) >= num_workers
        rb_counter = 0
        for source_id, path in enumerate(self._paths):
            if by_file and source_id % num_workers != worker_id:
                continue
            ro, po, co = self._read_opts()
            row = 0
            with pacsv.open_csv(
                path, read_options=ro, parse_options=po, convert_options=co
            ) as reader:
                for rb in reader:
                    if rb.num_rows == 0:
                        continue
                    if not by_file:
                        take = rb_counter % num_workers == worker_id
                        rb_counter += 1
                        if not take:
                            row += rb.num_rows
                            continue
                    yield source_id, row, rb
                    row += rb.num_rows


class CsvWriter(BaseWriter):
    def __init__(self, output_path: str, **kwargs: Any) -> None:
        super().__init__(output_path, **kwargs)
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        self._f = None
        self._writer = None

    def write(self, output_dict: Dict[str, pa.Array]) -> None:
        cols = {
            k: (v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
            for k, v in output_dict.items()
        }
        with self._lock:
            if self._writer is None:
                path = self._output_path
                if not path.endswith(".csv"):
                    os.makedirs(path, exist_ok=True)
                    path = os.path.join(path, "part-0.csv")
                self._f = open(path, "w", newline="")
                self._writer = _csv.writer(self._f)
                self._writer.writerow(list(cols.keys()))
            n = len(next(iter(cols.values())))
            pylists = [c.to_pylist() for c in cols.values()]
            for i in range(n):
                self._writer.writerow([pl[i] for pl in pylists])

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None
            self._writer = None
