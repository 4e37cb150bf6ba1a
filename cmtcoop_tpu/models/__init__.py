"""Model zoo exports."""
from cmtcoop_tpu.models.cmt_head import AgentInputs, CmtHead  # noqa: F401
from cmtcoop_tpu.models.detector import (CmtCoopDetector, CmtDetector,  # noqa: F401
                                         FeatureExtractor)
from cmtcoop_tpu.models.pillar_encoder import PillarSparseEncoder  # noqa: F401
from cmtcoop_tpu.models.second import SECOND, SECONDFPN  # noqa: F401
from cmtcoop_tpu.models.sparse_encoder import SparseEncoder  # noqa: F401
from cmtcoop_tpu.models.vovnet import CPFPN, VoVNet  # noqa: F401
