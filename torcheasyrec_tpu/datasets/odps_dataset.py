"""ODPS (MaxCompute) reader/writer stubs.

The reference's ODPS path (/root/reference/tzrec/datasets/odps_dataset.py,
848 LoC) depends on Alibaba-Cloud-specific wheels (pyodps/common_io
storage-api tunnels) that are out of scope for the TPU runtime
(SURVEY.md §2.1 row "common_io / pyodps"). The classes register so
reference configs with ``dataset_type: OdpsDataset`` fail with a clear
actionable message (convert tables to Parquet) instead of a registry
miss.
"""

from typing import Any, List, Optional

from torcheasyrec_tpu.datasets.dataset import BaseReader, BaseWriter

_MSG = (
    "OdpsDataset requires Alibaba MaxCompute wheels (pyodps/common_io) "
    "which are not part of the TPU runtime. Export the table to Parquet "
    "(odps tunnel / pyodps DataFrame.to_pandas) and use "
    "dataset_type: ParquetDataset."
)


class OdpsReader(BaseReader):
    def __init__(self, input_path: str, batch_size: int,
                 selected_cols: Optional[List[str]] = None,
                 **kwargs: Any) -> None:
        raise NotImplementedError(_MSG)


class OdpsReaderV1(OdpsReader):
    pass


class OdpsWriter(BaseWriter):
    def __init__(self, output_path: str, **kwargs: Any) -> None:
        raise NotImplementedError(_MSG)
