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
