from gdrnet_tpu.losses.pm_loss import point_matching_loss
from gdrnet_tpu.losses.gdrn_loss import gdrn_loss
from gdrnet_tpu.losses.basic import (
    l1_loss,
    l2_loss,
    mse_loss,
    smooth_l1_loss,
    cross_entropy_heatmap_loss,
    angular_distance_loss,
    rot_l2_loss,
)

__all__ = [
    "point_matching_loss",
    "gdrn_loss",
    "l1_loss",
    "l2_loss",
    "mse_loss",
    "smooth_l1_loss",
    "cross_entropy_heatmap_loss",
    "angular_distance_loss",
    "rot_l2_loss",
]
