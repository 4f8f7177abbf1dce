"""Model subsystem: PointNet++ modules, VoteNet, losses, decode."""

from votenet_tpu.models.pointnet2 import (
    PointNetSAModule,
    PointNetFPModule,
    PointNetSAModuleMSG,
    sample_and_group,
    sample_and_group_all,
)
from votenet_tpu.models.votenet import VoteNet
from votenet_tpu.models.losses import votenet_loss, VoteNetLossOutput
from votenet_tpu.models.decode import decode_proposals, predict_boxes

__all__ = [
    "PointNetSAModule", "PointNetFPModule", "PointNetSAModuleMSG",
    "sample_and_group", "sample_and_group_all",
    "VoteNet", "votenet_loss", "VoteNetLossOutput",
    "decode_proposals", "predict_boxes",
]
