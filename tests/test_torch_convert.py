"""Numeric parity of the torch->flax converter: build torch modules with the
reference's architecture/naming (plain torch.nn, written here), convert their
state_dicts, and require the flax forward to match the torch forward to
float32 tolerance. This is the machinery the reference-checkpoint fidelity
gate runs through (BASELINE.json "ape, provided test_bboxes" config).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gdrnet_tpu.models.resnet import ResNetBackbone  # noqa: E402
from gdrnet_tpu.models.heads import RotWithRegionHead  # noqa: E402
from gdrnet_tpu.models.conv_pnp_net import ConvPnPNet  # noqa: E402
from gdrnet_tpu.models.layers import ConvTranspose2dTorch  # noqa: E402
from gdrnet_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402


def _torch_basic_block(cin, cout, stride=1):
    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    return Block()


class TorchBackbone(tnn.Module):
    """resnet18 trunk with the reference's naming (resnet_backbone.py:17-80)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for li, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(_torch_basic_block(cin, w, stride))
                cin = w
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


def _randomize(m: tnn.Module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
    return m


def test_convtranspose_module_matches_torch(rng):
    x = rng.randn(2, 8, 8, 32).astype(np.float32)
    w = rng.randn(32, 16, 3, 3).astype(np.float32) * 0.1
    tc = tnn.ConvTranspose2d(32, 16, 3, 2, 1, output_padding=1, bias=False)
    tc.weight.data = torch.from_numpy(w)
    want = tc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    m = ConvTranspose2dTorch(16, kernel_size=3, stride=2, padding=1, output_padding=1)
    out = m.apply({"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1)))}},
                  jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), want,
                               atol=1e-4)


def test_backbone_parity(rng):
    tb = _randomize(TorchBackbone(), seed=1).eval()
    sd = {f"backbone.{k}": v for k, v in tb.state_dict().items()}
    params, stats = convert_torch_state_dict(sd)

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    fb = ResNetBackbone(depth=18)
    vs = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = fb.apply({"params": params["backbone"],
                    "batch_stats": stats["backbone"]}, jnp.asarray(x), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4)


class TorchRotHead(tnn.Module):
    """No-concat geometry head with the reference's ModuleList layout
    (cdpn_rot_head_region.py:82-137)."""

    def __init__(self, in_ch=512, nf=64, out_ch=1 + 3 + 5):
        super().__init__()
        feats = [tnn.ConvTranspose2d(in_ch, nf, 3, 2, 1, output_padding=1, bias=False),
                 tnn.BatchNorm2d(nf), tnn.ReLU(inplace=True)]
        for i in range(3):
            if i >= 1:
                feats.append(tnn.UpsamplingBilinear2d(scale_factor=2))
            for _ in range(2):
                feats += [tnn.Conv2d(nf, nf, 3, 1, 1, bias=False),
                          tnn.BatchNorm2d(nf), tnn.ReLU(inplace=True)]
        feats.append(tnn.Conv2d(nf, out_ch, 1, bias=True))
        self.features = tnn.ModuleList(feats)

    def forward(self, x):
        for l in self.features:
            x = l(x)
        return x


def test_rot_head_parity(rng):
    th = _randomize(TorchRotHead(), seed=2).eval()
    sd = {f"rot_head_net.{k}": v for k, v in th.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, head_norm="BN")

    x = rng.rand(2, 4, 4, 512).astype(np.float32)
    with torch.no_grad():
        want = th(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    fh = RotWithRegionHead(rot_output_dim=3, mask_output_dim=1,
                           region_output_dim=5, num_filters=64, norm="BN")
    got = fh.apply({"params": params["rot_head"],
                    "batch_stats": stats["rot_head"]}, jnp.asarray(x), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=5e-4)


class TorchPnP(tnn.Module):
    """ConvPnPNet torch twin (conv_pnp_net.py:76-110, GN norm)."""

    def __init__(self, nin=8, featdim=32, rot_dim=6, spatial=16):
        super().__init__()
        feats = []
        for i in range(3):
            cin = nin if i == 0 else featdim
            feats += [tnn.Conv2d(cin, featdim, 3, 2, 1, bias=False),
                      tnn.GroupNorm(4, featdim), tnn.ReLU(inplace=True)]
        self.features = tnn.ModuleList(feats)
        flat = featdim * (spatial // 8) ** 2
        self.fc1 = tnn.Linear(flat, 64)
        self.fc2 = tnn.Linear(64, 32)
        self.fc_r = tnn.Linear(32, rot_dim)
        self.fc_t = tnn.Linear(32, 3)
        self.act = tnn.LeakyReLU(0.1)

    def forward(self, x):
        for l in self.features:
            x = l(x)
        x = x.flatten(1)
        x = self.act(self.fc1(x))
        x = self.act(self.fc2(x))
        return self.fc_r(x), self.fc_t(x)


def _normalize_t(v, eps=1e-8):
    return v / (v.norm(dim=1, keepdim=True) + eps)


def _ortho6d_to_mat_t(poses):
    """Reference ortho6d_to_mat_batch (core/utils/rot_reps.py:34-48)."""
    x = _normalize_t(poses[:, 0:3])
    z = _normalize_t(torch.cross(x, poses[:, 3:6], dim=1))
    y = torch.cross(z, x, dim=1)
    return torch.stack([x, y, z], dim=2)  # columns


def _quat2mat_t(q):
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return torch.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], dim=1).view(-1, 3, 3)


def _allo_to_ego_mat_t(translation, rot_allo, eps=0.0):
    """Reference allo->ego. eps=1e-4 gives the additive-eps TRAIN path
    (allo_to_ego_mat_torch, core/utils/utils.py:208-238); eps=0 gives the
    exact-normalization TEST path (allocentric_to_egocentric numpy,
    utils.py:39-95 — what checkpoint evaluation runs through). The two
    differ by ~4e-3 in R; this repo's allo_to_ego_mat matches the test
    path (to ~3e-7), see ops/rotation.py:286 NOTE."""
    obj_ray = translation / (translation.norm(dim=1, keepdim=True) + eps)
    angle = obj_ray[:, 2:3].acos()
    cam_ray = torch.tensor([0.0, 0.0, 1.0]).expand_as(obj_ray)
    axis = torch.cross(cam_ray, obj_ray, dim=1)
    axis = axis / (axis.norm(dim=1, keepdim=True) + eps)
    q = torch.cat([torch.cos(angle / 2.0), axis * torch.sin(angle / 2.0)], dim=1)
    return torch.matmul(_quat2mat_t(q), rot_allo)


class TorchGDRNComposed(tnn.Module):
    """Full-composition torch twin of the flagship GDRN forward (reference
    GDRN.py:83-306): backbone -> rot_head -> [mask|xyz|region] split ->
    denorm-by-extent + 2D-coord concat + region attention -> ConvPnPNet ->
    ortho6d -> SITE decode (pose_from_pred_centroid_z.py:144-227, REL z)."""

    def __init__(self, num_regions=4):
        super().__init__()
        self.num_regions = num_regions
        self.backbone = TorchBackbone()
        self.rot_head = TorchRotHead(in_ch=512, nf=64,
                                     out_ch=1 + 3 + (num_regions + 1))
        self.pnp = TorchPnP(nin=3 + 2 + num_regions, featdim=32, rot_dim=6,
                            spatial=16)
        self.pnp.fc1 = tnn.Linear(32 * 2 * 2, 1024)
        self.pnp.fc2 = tnn.Linear(1024, 256)
        self.pnp.fc_r = tnn.Linear(256, 6)
        self.pnp.fc_t = tnn.Linear(256, 3)

    def forward(self, x, coord_2d, extents, cams, centers, whs, ratios):
        feat = self.backbone(x)                   # [B,512,2,2]
        out = self.rot_head(feat)                 # [B,C,16,16]
        coor = out[:, 1:4]
        region = out[:, 4:]
        # ConvPnPNet input assembly (conv_pnp_net.py:111-136): denorm first 3
        # channels by extents, concat 2D coords, concat region softmax (bg
        # channel 0 excluded, GDRN.py:169)
        xyz = (coor - 0.5) * extents[:, :, None, None]
        pnp_in = torch.cat([xyz, coord_2d,
                            torch.softmax(region[:, 1:], dim=1)], dim=1)
        rot6d, t_ = self.pnp(pnp_in)
        rot_allo = _ortho6d_to_mat_t(rot6d)
        # SITE: centroid offset in bbox units + REL z
        cx = t_[:, 0] * whs[:, 0] + centers[:, 0]
        cy = t_[:, 1] * whs[:, 1] + centers[:, 1]
        z = t_[:, 2] * ratios
        tx = z * (cx - cams[:, 0, 2]) / cams[:, 0, 0]
        ty = z * (cy - cams[:, 1, 2]) / cams[:, 1, 1]
        trans = torch.stack([tx, ty, z], dim=1)
        rot_ego = _allo_to_ego_mat_t(trans, rot_allo)
        return rot_ego, trans


def test_full_gdrn_composed_parity(rng):
    """End-to-end pose parity of the composed model: torch twin forward vs
    converted flax GDRN forward agree on R (3x3) and t to f32 tolerance.
    This is the whole-checkpoint gate the per-module tests approximate
    (docs/parity_runbook.md)."""
    from gdrnet_tpu.models.gdrn import GDRN

    tm = TorchGDRNComposed().eval()
    _randomize(tm, seed=7)
    # random init leaves rot6d outputs ~0.1; the normalize/cross chain in
    # ortho6d amplifies relative f32 error there ~100x. Trained checkpoints
    # emit O(1) rot6d, so scale the final fcs to make the gate realistic.
    with torch.no_grad():
        tm.pnp.fc_r.weight.mul_(10.0)
        tm.pnp.fc_t.weight.mul_(5.0)
    sd = {}
    for k, v in tm.state_dict().items():
        key = {"backbone": "backbone", "rot_head": "rot_head_net",
               "pnp": "pnp_net"}[k.split(".")[0]]
        sd[key + k[k.index("."):]] = v
    params, stats = convert_torch_state_dict(sd, head_norm="BN", pnp_norm="GN")

    B = 3
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    coord_2d = rng.rand(B, 16, 16, 2).astype(np.float32)
    extents = (rng.rand(B, 3).astype(np.float32) * 0.1 + 0.05)
    cams = np.tile(np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    centers = rng.rand(B, 2).astype(np.float32) * 100 + 100
    whs = rng.rand(B, 2).astype(np.float32) * 60 + 40
    ratios = rng.rand(B).astype(np.float32) * 0.5 + 0.5

    with torch.no_grad():
        want_R, want_t = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(coord_2d, (0, 3, 1, 2))),
            torch.from_numpy(extents), torch.from_numpy(cams),
            torch.from_numpy(centers), torch.from_numpy(whs),
            torch.from_numpy(ratios))

    fm = GDRN(backbone_depth=18, num_regions=4, head_num_filters=64,
              head_norm="BN", pnp_featdim=32, pnp_norm="GN", pnp_gn_groups=4,
              with_2d_coord=True, region_attention=True,
              rot_type="allo_rot6d", trans_type="centroid_z", z_type="REL")
    out = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        roi_coord_2d=jnp.asarray(coord_2d), roi_cams=jnp.asarray(cams),
        roi_centers=jnp.asarray(centers), roi_whs=jnp.asarray(whs),
        roi_extents=jnp.asarray(extents), resize_ratios=jnp.asarray(ratios),
        train=False)
    got_R, got_t = np.asarray(out["rot"]), np.asarray(out["trans"])
    # tolerance: ~2e-3 of f32 conv-stack noise accumulates through the
    # randomized 20-layer composition; semantic bugs (wrong channel split,
    # train-path eps in allo->ego, missing attention) are >= 4e-3
    np.testing.assert_allclose(got_R, want_R.numpy(), atol=3e-3)
    np.testing.assert_allclose(got_t, want_t.numpy(), rtol=2e-3, atol=2e-4)
    # sanity: outputs are valid rotations
    for i in range(B):
        np.testing.assert_allclose(got_R[i] @ got_R[i].T, np.eye(3), atol=1e-4)


def test_load_torch_checkpoint_pth(tmp_path, rng):
    """MODEL.WEIGHTS=<file>.pth eval path: a saved reference-style .pth
    (with a DDP-ish 'model' wrapper key) converts identically to the
    in-memory state_dict conversion."""
    from gdrnet_tpu.utils.torch_convert import load_torch_checkpoint

    tm = TorchGDRNComposed().eval()
    _randomize(tm, seed=11)
    sd = {}
    for k, v in tm.state_dict().items():
        key = {"backbone": "backbone", "rot_head": "rot_head_net",
               "pnp": "pnp_net"}[k.split(".")[0]]
        sd[key + k[k.index("."):]] = v
    want_params, want_stats = convert_torch_state_dict(
        sd, head_norm="BN", pnp_norm="GN")
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd, "iteration": 123}, path)
    params, stats = load_torch_checkpoint(path, head_norm="BN", pnp_norm="GN")
    jax.tree.map(np.testing.assert_array_equal, params, want_params)
    jax.tree.map(np.testing.assert_array_equal, stats, want_stats)


def test_ce_decode_reference_mode(rng):
    """get_out_coor decode_type='reference' is bit-faithful to
    engine_utils.get_out_coor (engine_utils.py:92-105): argmax over all bins,
    bg-argmax pixels zeroed, idx/(bin-1)."""
    from gdrnet_tpu.engine.decode import get_out_coor

    B_, H_, W_, nbin = 2, 4, 4, 8
    logits = [rng.randn(B_, H_, W_, nbin + 1).astype(np.float32)
              for _ in range(3)]
    got = np.asarray(get_out_coor(*[jnp.asarray(l) for l in logits],
                                  xyz_bin=nbin, decode_type="reference"))
    want = []
    for l in logits:
        t = torch.from_numpy(np.transpose(l, (0, 3, 1, 2)))
        idx = torch.argmax(t, dim=1)
        idx[idx == nbin] = 0
        want.append((idx / float(nbin - 1)).numpy())
    np.testing.assert_allclose(got, np.stack(want, axis=-1), atol=1e-7)


def test_pnp_net_parity(rng):
    tp = _randomize(TorchPnP(), seed=3).eval()
    sd = {f"pnp_net.{k}": v for k, v in tp.state_dict().items()}
    params, stats = convert_torch_state_dict(sd, pnp_norm="GN")

    x = rng.rand(2, 16, 16, 8).astype(np.float32)
    with torch.no_grad():
        want_r, want_t = tp(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    fp = ConvPnPNet(rot_dim=6, featdim=32, norm="GN", num_gn_groups=4,
                    fc1_dim=64, fc2_dim=32, denormalize_by_extent=False)
    got_r, got_t = fp.apply({"params": params["pnp_net"]}, jnp.asarray(x))
    # NOTE: torch flattens CHW, flax flattens HWC — fc1 parity requires the
    # converter to permute fc1 rows; verified here
    np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=5e-4)


# ---- ImageNet backbone init (reference GDRN.py:713-721: official
# torchvision weights load into the backbone when MODEL.WEIGHTS=="") ----


def test_torchvision_resnet_convert_parity(rng):
    """Raw torchvision-format state_dict (no backbone. prefix, with fc.*)
    converts and matches the torch forward exactly."""
    from gdrnet_tpu.utils.torch_convert import convert_torchvision_resnet

    tb = _randomize(TorchBackbone(), seed=7).eval()
    sd = dict(tb.state_dict())
    # torchvision checkpoints carry the ImageNet classifier; must be dropped
    sd["fc.weight"] = torch.randn(1000, 512)
    sd["fc.bias"] = torch.randn(1000)
    params, stats = convert_torchvision_resnet(sd)

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    fb = ResNetBackbone(depth=18)
    got = fb.apply({"params": params["backbone"],
                    "batch_stats": stats["backbone"]}, jnp.asarray(x),
                   train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, atol=2e-4)


class _FakeState:
    """Minimal stand-in exposing the .params/.batch_stats/.replace surface
    init_model_weights consumes (a full GDRNTrainState needs a device batch)."""

    def __init__(self, params, batch_stats):
        self.params, self.batch_stats = params, batch_stats

    def replace(self, **kw):
        return _FakeState(kw.get("params", self.params),
                          kw.get("batch_stats", self.batch_stats))


def test_init_model_weights_pretrained_backbone(tmp_path, rng):
    """BACKBONE.PRETRAINED path: backbone subtree replaced from the .pth,
    everything else untouched; bad shapes fail loudly; empty PRETRAINED
    warns 'Randomly initialize weights for backbone!' (reference :717)."""
    import logging

    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.engine.checkpoint import init_model_weights

    tb = _randomize(TorchBackbone(), seed=9).eval()
    pth = str(tmp_path / "resnet18_imagenet.pth")
    torch.save(tb.state_dict(), pth)

    fb = ResNetBackbone(depth=18)
    vs = fb.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    head_kernel = jnp.asarray(rng.randn(3, 3, 4, 4), jnp.float32)
    state = _FakeState(
        params={"backbone": vs["params"],
                "rot_head": {"Conv_0": {"kernel": head_kernel}}},
        batch_stats={"backbone": vs["batch_stats"]})

    cfg = base_config()
    bb = cfg.MODEL.CDPN.BACKBONE
    bb.NUM_LAYERS = 18
    bb.PRETRAINED = pth
    logger = logging.getLogger("test_init_weights")
    out = init_model_weights(cfg, state, logger=logger)

    want = np.transpose(tb.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(out.params["backbone"]["conv1"]["kernel"]), want, atol=0)
    np.testing.assert_allclose(
        np.asarray(out.batch_stats["backbone"]["bn1"]["mean"]),
        tb.state_dict()["bn1.running_mean"].numpy(), atol=0)
    # non-backbone params untouched
    assert out.params["rot_head"]["Conv_0"]["kernel"] is head_kernel

    # random-init warning path (PRETRAINED empty)
    bb.PRETRAINED = ""
    import unittest.mock as mock

    with mock.patch.object(logger, "warning") as warn:
        out2 = init_model_weights(cfg, state, logger=logger)
    assert out2 is state
    assert "Randomly initialize weights for backbone" in warn.call_args[0][0]

    # depth mismatch (resnet18 weights into a resnet34 tree) fails loudly
    fb34 = ResNetBackbone(depth=34)
    vs34 = fb34.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    state34 = _FakeState(params={"backbone": vs34["params"]},
                         batch_stats={"backbone": vs34["batch_stats"]})
    bb.PRETRAINED = pth
    with pytest.raises(KeyError):
        init_model_weights(cfg, state34, logger=logger)
