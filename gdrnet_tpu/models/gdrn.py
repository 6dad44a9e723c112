"""GDRN: backbone -> dense geometry -> Patch-PnP -> 6D pose (flax, NHWC).

TPU-native composition of the reference's GDRN module
(core/gdrn_modeling/models/GDRN.py:33-306): one traced forward for the whole
ROI batch — backbone 256^2 -> 8^2, geometry head -> 64^2 [mask|xyz|region],
(bin-softmax'd) coord features + optional 2D-coord / region / mask attention
-> ConvPnPNet -> (rot param, [dx, dy, z]) -> rotation decode (quat / rot6d /
log_quat / lie_vec) -> SITE pose decode (allo->ego). Loss assembly lives in
gdrnet_tpu.losses.gdrn_loss (pure function), not inside the module.

MTL uncertainty weighting (reference GDRN.py:53-81): per-loss log-variance
scalars are flax params under the "mtl" scope.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gdrnet_tpu.models.resnet import ResNetBackbone
from gdrnet_tpu.models.heads import RotWithRegionHead, TransHeadNet
from gdrnet_tpu.models.conv_pnp_net import ConvPnPNet
from gdrnet_tpu.ops import rotation as R
from gdrnet_tpu.ops import pose as pose_ops

MTL_LOSS_NAMES = (
    "mask", "coor_x", "coor_y", "coor_z", "coor_x_bin", "coor_y_bin",
    "coor_z_bin", "region", "PM_R", "PM_xy", "PM_z", "PM_xy_noP", "PM_z_noP",
    "PM_T", "PM_T_noP", "PM_RT", "centroid", "z", "trans_xy", "trans_z",
    "trans_LPnP", "rot", "bind",
)


def rot_param_dim(rot_type: str) -> int:
    if "rot6d" in rot_type:
        return 6
    if "lie_vec" in rot_type:
        return 3
    return 4  # quat / log_quat


def decode_rot(pred_rot: jnp.ndarray, rot_type: str) -> jnp.ndarray:
    """Net rotation parameterization -> [B, 3, 3] (reference GDRN.py:186-196)."""
    if "rot6d" in rot_type:
        return R.ortho6d_to_mat(pred_rot)
    if "log_quat" in rot_type:
        return R.quat_to_mat(R.quat_exp(pred_rot))
    if "lie_vec" in rot_type:
        return R.so3_exp(pred_rot)
    if "quat" in rot_type:
        return R.quat_to_mat(pred_rot)
    raise ValueError(f"Unknown rot type: {rot_type}")


def get_mask_prob(mask_logits: jnp.ndarray, mask_loss_type: str) -> jnp.ndarray:
    """[B,H,W,C] head mask channels -> [B,H,W,1] probability (reference
    model_utils.get_mask_prob)."""
    if mask_loss_type == "L1":
        b = mask_logits.shape[0]
        flat = mask_logits.reshape(b, -1)
        mx = flat.max(axis=-1).reshape(b, 1, 1, 1)
        mn = flat.min(axis=-1).reshape(b, 1, 1, 1)
        return (mask_logits - mn) / jnp.maximum(mx - mn, 1e-6)
    if mask_loss_type == "BCE":
        return jax.nn.sigmoid(mask_logits)
    if mask_loss_type == "CE":
        return jax.nn.softmax(mask_logits, axis=-1)[..., 1:2]
    raise ValueError(f"unknown mask loss type: {mask_loss_type}")


class GDRN(nn.Module):
    """Config fields mirror MODEL.CDPN.* (gdrnet_tpu/config/defaults.py)."""

    backbone_depth: int = 34
    backbone_freeze: bool = False
    backbone_remat: bool = False
    rot_concat: bool = False
    # head dims
    xyz_loss_type: str = "L1"      # L1 | CE_coor
    xyz_bin: int = 64
    mask_loss_type: str = "L1"     # L1 | BCE | CE
    num_regions: int = 8
    head_num_layers: int = 3
    head_num_filters: int = 256
    head_kernel_size: int = 3
    head_out_kernel_size: int = 1
    head_norm: str = "BN"
    head_gn_groups: int = 32
    head_freeze: bool = False
    num_classes: int = 1
    rot_class_aware: bool = False
    mask_class_aware: bool = False
    region_class_aware: bool = False
    # pnp net
    pnp_head_type: str = "ConvPnPNet"  # ConvPnPNet | PointPnPNet | SimplePointPnPNet
    pnp_norm: str = "GN"
    pnp_gn_groups: int = 32
    pnp_featdim: int = 128
    pnp_num_layers: int = 3
    pnp_drop_prob: float = 0.0
    pnp_dropblock_size: int = 5
    pnp_freeze: bool = False
    with_2d_coord: bool = False
    region_attention: bool = False
    mask_attention: str = "none"
    rot_type: str = "allo_rot6d"
    trans_type: str = "centroid_z"
    z_type: str = "REL"
    r_only: bool = False
    # trans head (legacy, for r_only)
    trans_head_enabled: bool = False
    trans_head_freeze: bool = True
    # mtl
    use_mtl: bool = False
    dtype: Any = jnp.float32

    @property
    def rot_output_dim(self) -> int:
        return 3 * (self.xyz_bin + 1) if self.xyz_loss_type in ("CE_coor", "CE") else 3

    @property
    def mask_output_dim(self) -> int:
        return 2 if self.mask_loss_type == "CE" else 1

    def setup(self):
        self.backbone = ResNetBackbone(
            depth=self.backbone_depth, freeze=self.backbone_freeze,
            rot_concat=self.rot_concat, remat=self.backbone_remat,
            dtype=self.dtype, name="backbone")
        self.rot_head = RotWithRegionHead(
            rot_output_dim=self.rot_output_dim,
            mask_output_dim=self.mask_output_dim,
            region_output_dim=self.num_regions + 1,
            num_layers=self.head_num_layers,
            num_filters=self.head_num_filters,
            kernel_size=self.head_kernel_size,
            output_kernel_size=self.head_out_kernel_size,
            norm=self.head_norm,
            num_gn_groups=self.head_gn_groups,
            freeze=self.head_freeze,
            concat=self.rot_concat,
            num_classes=self.num_classes,
            rot_class_aware=self.rot_class_aware,
            mask_class_aware=self.mask_class_aware,
            region_class_aware=self.region_class_aware,
            dtype=self.dtype,
            name="rot_head",
        )
        if self.pnp_head_type == "ConvPnPNet":
            self.pnp_net = ConvPnPNet(
                rot_dim=rot_param_dim(self.rot_type),
                featdim=self.pnp_featdim,
                num_layers=self.pnp_num_layers,
                norm=self.pnp_norm,
                num_gn_groups=self.pnp_gn_groups,
                drop_prob=self.pnp_drop_prob,
                dropblock_size=self.pnp_dropblock_size,
                mask_attention_type=self.mask_attention,
                freeze=self.pnp_freeze,
                dtype=self.dtype,
                name="pnp_net",
            )
        elif self.pnp_head_type == "PointPnPNet":
            from gdrnet_tpu.models.point_pnp_net import PointPnPNet

            self.pnp_net = PointPnPNet(
                rot_dim=rot_param_dim(self.rot_type),
                num_regions=self.num_regions,
                mask_attention_type=self.mask_attention,
                dtype=self.dtype, name="pnp_net")
        elif self.pnp_head_type == "SimplePointPnPNet":
            from gdrnet_tpu.models.point_pnp_net import SimplePointPnPNet

            self.pnp_net = SimplePointPnPNet(
                rot_dim=rot_param_dim(self.rot_type),
                mask_attention_type=self.mask_attention,
                dtype=self.dtype, name="pnp_net")
        else:
            raise ValueError(f"Unknown pnp head type: {self.pnp_head_type}")
        if self.trans_head_enabled or self.r_only:
            self.trans_head = TransHeadNet(
                freeze=self.trans_head_freeze, dtype=self.dtype, name="trans_head")
        if self.use_mtl:
            self.log_vars = {
                n: self.param(f"log_var_{n}", nn.initializers.zeros, (1,))
                for n in MTL_LOSS_NAMES
            }

    def __call__(self, x: jnp.ndarray,
                 roi_classes: jnp.ndarray | None = None,
                 roi_coord_2d: jnp.ndarray | None = None,
                 roi_cams: jnp.ndarray | None = None,
                 roi_centers: jnp.ndarray | None = None,
                 roi_whs: jnp.ndarray | None = None,
                 roi_extents: jnp.ndarray | None = None,
                 resize_ratios: jnp.ndarray | None = None,
                 *, train: bool = False,
                 dropblock_progress: float | jnp.ndarray = 1.0) -> dict:
        """x [B, 256, 256, 3] normalized ROI crops. Returns a dict with the
        raw geometry maps, attention features, net outputs and decoded pose —
        everything gdrn_loss and the evaluators need."""
        x = x.astype(self.dtype)
        if self.rot_concat:
            feat, f64, f32, f16 = self.backbone(x, train=train)
            head_out = self.rot_head(feat, f64, f32, f16, train=train)
        else:
            feat = self.backbone(x, train=train)
            head_out = self.rot_head(feat, train=train)

        mask, coor_x, coor_y, coor_z, region = self.rot_head.split_outputs(
            head_out, roi_classes if (self.rot_class_aware or self.mask_class_aware
                                      or self.region_class_aware) else None)

        # bin-softmax coor features (reference GDRN.py:156-162); last bin = bg
        if coor_x.shape[-1] > 1:
            coor_feat = jnp.concatenate([
                jax.nn.softmax(coor_x[..., :-1], axis=-1),
                jax.nn.softmax(coor_y[..., :-1], axis=-1),
                jax.nn.softmax(coor_z[..., :-1], axis=-1),
            ], axis=-1)
        else:
            coor_feat = jnp.concatenate([coor_x, coor_y, coor_z], axis=-1)

        if self.with_2d_coord:
            assert roi_coord_2d is not None
            coor_feat = jnp.concatenate([coor_feat, roi_coord_2d.astype(coor_feat.dtype)], axis=-1)

        # region softmax excluding bg channel 0 (reference GDRN.py:169)
        region_softmax = jax.nn.softmax(region[..., 1:], axis=-1)
        region_atten = region_softmax if self.region_attention else None
        mask_atten = (get_mask_prob(mask, self.mask_loss_type)
                      if self.mask_attention != "none" else None)

        pred_rot_param, pred_t_ = self.pnp_net(
            coor_feat, region=region_atten, extents=roi_extents,
            mask_attention=mask_atten, train=train,
            dropblock_progress=dropblock_progress)

        if self.r_only:
            pred_t_ = self.trans_head(feat, train=train)

        pred_rot_m = decode_rot(pred_rot_param, self.rot_type)
        is_allo = "allo" in self.rot_type

        if self.trans_type == "centroid_z":
            pred_ego_rot, pred_trans = pose_ops.pose_from_centroid_z(
                pred_rot_m, pred_t_[:, :2], pred_t_[:, 2],
                roi_cams, roi_centers, resize_ratios, roi_whs,
                is_allo=is_allo, z_type=self.z_type)
        elif self.trans_type == "centroid_z_abs":
            pred_ego_rot, pred_trans = pose_ops.pose_from_centroid_z_abs(
                pred_rot_m, pred_t_[:, :2], pred_t_[:, 2], roi_cams, is_allo=is_allo)
        elif self.trans_type == "trans":
            pred_ego_rot, pred_trans = pose_ops.pose_from_pred(
                pred_rot_m, pred_t_, is_allo=is_allo)
        else:
            raise ValueError(f"Unknown trans type: {self.trans_type}")

        out = {
            "rot": pred_ego_rot,
            "trans": pred_trans,
            "mask": mask,
            "coor_x": coor_x,
            "coor_y": coor_y,
            "coor_z": coor_z,
            "region": region,
            "pred_t_": pred_t_,  # (dx, dy, z) net outputs for centroid/z losses
            "pred_rot_param": pred_rot_param,
        }
        if self.use_mtl:
            out["log_vars"] = self.log_vars
        return out


def build_model(cfg) -> GDRN:
    """MODEL.CDPN config subtree -> GDRN module (reference
    build_model_optimizer, GDRN.py:550 — optimizer construction lives in
    gdrnet_tpu.solver)."""
    net_cfg = cfg.MODEL.CDPN
    bb = net_cfg.BACKBONE
    rh = net_cfg.ROT_HEAD
    pnp = net_cfg.PNP_NET
    th = net_cfg.TRANS_HEAD
    pnp_head_cfg = pnp.get("PNP_HEAD_CFG", {})
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.get_path("PARALLEL.DTYPE", "float32") if hasattr(cfg, "get_path") else "float32"]
    return GDRN(
        backbone_depth=bb.NUM_LAYERS,
        backbone_freeze=bb.FREEZE,
        backbone_remat=cfg.get_path("PARALLEL.REMAT", False) if hasattr(cfg, "get_path") else False,
        rot_concat=rh.ROT_CONCAT,
        xyz_loss_type=rh.XYZ_LOSS_TYPE,
        xyz_bin=rh.XYZ_BIN,
        mask_loss_type=rh.MASK_LOSS_TYPE,
        num_regions=rh.NUM_REGIONS,
        head_num_layers=rh.NUM_LAYERS,
        head_num_filters=rh.NUM_FILTERS,
        head_kernel_size=rh.CONV_KERNEL_SIZE,
        head_out_kernel_size=rh.OUT_CONV_KERNEL_SIZE,
        head_norm=rh.NORM,
        head_gn_groups=rh.NUM_GN_GROUPS,
        head_freeze=rh.FREEZE,
        num_classes=rh.NUM_CLASSES,
        rot_class_aware=rh.ROT_CLASS_AWARE,
        mask_class_aware=rh.MASK_CLASS_AWARE,
        region_class_aware=rh.REGION_CLASS_AWARE,
        pnp_head_type=pnp_head_cfg.get("type", "ConvPnPNet"),
        pnp_norm=pnp_head_cfg.get("norm", "GN"),
        pnp_gn_groups=pnp_head_cfg.get("num_gn_groups", 32),
        pnp_featdim=pnp_head_cfg.get("featdim", 128),
        pnp_num_layers=pnp_head_cfg.get("num_layers", 3),
        pnp_drop_prob=pnp_head_cfg.get("drop_prob", 0.0),
        pnp_dropblock_size=pnp_head_cfg.get("dropblock_size", 5),
        pnp_freeze=pnp.FREEZE,
        with_2d_coord=pnp.WITH_2D_COORD,
        region_attention=pnp.REGION_ATTENTION,
        mask_attention=pnp.MASK_ATTENTION,
        rot_type=pnp.ROT_TYPE,
        trans_type=pnp.TRANS_TYPE,
        z_type=pnp.Z_TYPE,
        r_only=pnp.R_ONLY,
        trans_head_enabled=th.ENABLED,
        trans_head_freeze=th.FREEZE,
        use_mtl=net_cfg.USE_MTL,
        dtype=dtype,
    )
