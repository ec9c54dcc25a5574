from torcheasyrec_tpu.datasets import csv_dataset  # noqa: F401
from torcheasyrec_tpu.datasets import kafka_dataset  # noqa: F401
from torcheasyrec_tpu.datasets import odps_dataset  # noqa: F401
from torcheasyrec_tpu.datasets import parquet_dataset  # noqa: F401
from torcheasyrec_tpu.datasets.data_parser import DataParser  # noqa: F401
from torcheasyrec_tpu.datasets.dataset import (  # noqa: F401
    BaseDataset,
    BaseReader,
    BaseWriter,
    create_dataloader,
    create_reader,
    create_writer,
)
from torcheasyrec_tpu.datasets.utils import (  # noqa: F401
    Batch,
    BatchInfo,
    DenseField,
    SequenceDenseField,
    SparseField,
)
