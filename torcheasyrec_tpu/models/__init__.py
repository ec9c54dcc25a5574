"""Model registry: importing this package registers all model classes
so BaseModel.create_class(proto_message_name) resolves (reference
tzrec/models/__init__.py + main.py:150-164)."""

from torcheasyrec_tpu.models.dat import DAT  # noqa: F401
from torcheasyrec_tpu.models.dbmtl import DBMTL  # noqa: F401
from torcheasyrec_tpu.models.dc2vr import DC2VR  # noqa: F401
from torcheasyrec_tpu.models.dcn import DCNV1, DCNV2  # noqa: F401
from torcheasyrec_tpu.models.deepfm import DeepFM  # noqa: F401
from torcheasyrec_tpu.models.dlrm import DLRM  # noqa: F401
from torcheasyrec_tpu.models.dlrm_hstu import DlrmHSTU  # noqa: F401
from torcheasyrec_tpu.models.dssm import DSSM, DSSMV2  # noqa: F401
from torcheasyrec_tpu.models.hstu_match import HSTUMatch  # noqa: F401
from torcheasyrec_tpu.models.masknet import MaskNet  # noqa: F401
from torcheasyrec_tpu.models.mind import MIND  # noqa: F401
from torcheasyrec_tpu.models.mmoe import MMoE  # noqa: F401
from torcheasyrec_tpu.models.model import BaseModel  # noqa: F401
from torcheasyrec_tpu.models.multi_task_rank import (  # noqa: F401
    MultiTaskRank,
    SimpleMultiTask,
)
from torcheasyrec_tpu.models.multi_tower import (  # noqa: F401
    MultiTower,
    MultiTowerDIN,
)
from torcheasyrec_tpu.models.pepnet import PEPNet  # noqa: F401
from torcheasyrec_tpu.models.ple import PLE  # noqa: F401
from torcheasyrec_tpu.models.rocket_launching import RocketLaunching  # noqa: F401
from torcheasyrec_tpu.models.sid_models import SidRqkmeans, SidRqvae  # noqa: F401
from torcheasyrec_tpu.models.tdm import TDM  # noqa: F401
from torcheasyrec_tpu.models.ultra_hstu import UltraHSTU  # noqa: F401
from torcheasyrec_tpu.models.rank_model import RankModel  # noqa: F401
from torcheasyrec_tpu.models.wide_and_deep import WideAndDeep  # noqa: F401
from torcheasyrec_tpu.models.wukong import WuKong  # noqa: F401
from torcheasyrec_tpu.models.xdeepfm import XDeepFM  # noqa: F401

# proto message names that differ from class names
from torcheasyrec_tpu.models.model import _MODEL_CLASS_MAP

_MODEL_CLASS_MAP["xDeepFM"] = XDeepFM


def create_model(model_config, features, labels, sample_weights=None,
                 **kwargs) -> BaseModel:
    """ModelConfig proto -> model instance (reference main.py:132-164)."""
    which = model_config.WhichOneof("model")
    if which is None:
        raise ValueError("model_config.model oneof is not set")
    cls_name = type(getattr(model_config, which)).__name__
    cls = BaseModel.create_class(cls_name)
    return cls(model_config, features, labels, sample_weights, **kwargs)
