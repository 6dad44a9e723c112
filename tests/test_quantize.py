"""int8 post-training quantization (models/quantize.py): the intercepted
conv path must track the bf16 path closely on the full GDRN model, and the
calibration must cover exactly the quantizable convs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def gdrn_setup():
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.data import synthetic_roi_batch

    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64   # small = fast CPU compiles
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    cfg.MODEL.CDPN.PNP_NET.WITH_2D_COORD = True
    cfg.MODEL.CDPN.PNP_NET.REGION_ATTENTION = True
    model = build_model(cfg)
    b = synthetic_roi_batch(batch_size=4, input_res=64, out_res=16, seed=0)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    from gdrnet_tpu.engine.steps import _model_kwargs

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["roi_img"], **_model_kwargs(batch),
                           train=False)
    return cfg, model, variables, batch


def test_calibration_covers_quant_convs(gdrn_setup):
    from gdrnet_tpu.models.quantize import calibrate_act_scales

    cfg, model, variables, batch = gdrn_setup
    scales = calibrate_act_scales(model, variables, [batch])
    paths = set(scales)
    # every scale is positive and within the quantized subtree
    assert all(s > 0 for s in scales.values())
    assert all(p.startswith(("backbone", "rot_head", "pnp_net", "trans_head"))
               for p in paths)
    # the f32 emit conv must NOT be calibrated/quantized
    assert not any("out_conv" in p for p in paths)
    # R18 trunk: stem + 8 blocks x 2 convs + shortcuts; head stage convs
    assert sum(p.startswith("backbone") for p in paths) >= 17
    assert sum(p.startswith("rot_head") for p in paths) >= 6
    # the pnp_net fc1/fc2 Dense chain is calibrated; pnp_net CONVS (decoded
    # coordinate maps, rounding-sensitive) and the final fc_r/fc_t pose
    # regressors are not
    assert {"pnp_net/fc1", "pnp_net/fc2"} <= paths
    assert not any(p.startswith("pnp_net/conv") for p in paths)
    assert not any(p.endswith(("fc_r", "fc_t")) for p in paths)


@pytest.mark.parametrize("head", ["SimplePointPnPNet", "trans_head"])
def test_calibration_excludes_pose_outputs(head):
    """Non-default heads: the int8 path must keep pose regressors and the
    coordinate-consuming point-MLP Dense layers (named conv1-3) off the
    quantized set (ADVICE r3: fc_pose / trans_head fc_out / point conv1-3)."""
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.data import synthetic_roi_batch
    from gdrnet_tpu.models.quantize import calibrate_act_scales
    from gdrnet_tpu.engine.steps import _model_kwargs

    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    if head == "SimplePointPnPNet":
        cfg.MODEL.CDPN.PNP_NET.PNP_HEAD_CFG["type"] = "SimplePointPnPNet"
    else:
        cfg.MODEL.CDPN.PNP_NET.R_ONLY = True
        cfg.MODEL.CDPN.TRANS_HEAD.ENABLED = True
        cfg.MODEL.CDPN.TRANS_HEAD.FREEZE = False
    model = build_model(cfg)
    b = synthetic_roi_batch(batch_size=2, input_res=64, out_res=16, seed=0)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["roi_img"], **_model_kwargs(batch),
                           train=False)
    paths = set(calibrate_act_scales(model, variables, [batch]))
    # no pose-output regressor is ever quantized
    assert not any(p.endswith(("fc_r", "fc_t", "fc_pose", "fc_out"))
                   for p in paths), paths
    if head == "SimplePointPnPNet":
        # point-MLP Dense layers consume decoded coordinates — excluded
        assert not any(p.startswith("pnp_net/conv") for p in paths), paths
        assert "pnp_net/fc1" in paths and "pnp_net/fc2" in paths
    else:
        # trans_head: the flattened FC chain quantizes, the regressor not
        assert "trans_head/fc1" in paths and "trans_head/fc2" in paths
        assert "trans_head/fc_out" not in paths


def test_int8_predict_tracks_bf16(gdrn_setup):
    from gdrnet_tpu.engine.steps import make_predict_step
    from gdrnet_tpu.models.quantize import calibrate_act_scales
    from gdrnet_tpu.ops.rotation import rot_angle_deg

    cfg, model, variables, batch = gdrn_setup
    scales = calibrate_act_scales(model, variables, [batch])
    ref = make_predict_step(model)(variables, batch)
    q = make_predict_step(model, int8_scales=scales)(variables, batch)
    # rotations within a degree, translations within 5% rel on random init
    ang = np.asarray(rot_angle_deg(jnp.asarray(ref["rot"], jnp.float32),
                                   jnp.asarray(q["rot"], jnp.float32)))
    assert ang.max() < 1.0, ang
    t_ref = np.asarray(ref["trans"], np.float64)
    t_q = np.asarray(q["trans"], np.float64)
    rel = np.abs(t_q - t_ref) / np.maximum(np.abs(t_ref), 1e-3)
    assert rel.max() < 0.05, rel.max()


def test_int8_conv_exact_int_arithmetic():
    """With inputs/weights already on the int8 grid the quantized conv is
    EXACT (int32 accumulate) — validates scale bookkeeping end to end."""
    import flax.linen as nn
    from gdrnet_tpu.models.quantize import (calibrate_act_scales,
                                            quantized_scope)

    class One(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)],
                           use_bias=True, name="c")(x)

    m = One()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(-127, 128, (2, 8, 8, 4)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # put weights on the int grid with per-channel max exactly 127
    w = rng.randint(-127, 128, (3, 3, 4, 8)).astype(np.float32)
    w[0, 0, 0, :] = 127.0
    v = jax.tree_util.tree_map(lambda a: a, v)
    v = {"params": {"c": {"kernel": jnp.asarray(w),
                          "bias": v["params"]["c"]["bias"]}}}

    def apply_fn(vv, b, _apply):
        _apply(vv, b, train=False)

    scales = calibrate_act_scales(m, v, [x], apply_fn=apply_fn,
                                  prefixes=("c",), exclude_names=())
    assert scales["c"] == pytest.approx(1.0)
    ref = m.apply(v, x)
    with quantized_scope(scales, prefixes=("c",), exclude_names=()):
        q = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref), atol=1e-3)


def test_int8_dense_exact_int_arithmetic():
    """Dense twin of the conv exactness test: on-grid inputs/weights pass
    through the int8 dot_general path bit-exactly."""
    import flax.linen as nn
    from gdrnet_tpu.models.quantize import (calibrate_act_scales,
                                            quantized_scope)

    class One(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.Dense(16, use_bias=True, name="d")(x)

    m = One()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(-127, 128, (4, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    w = rng.randint(-127, 128, (32, 16)).astype(np.float32)
    w[0, :] = 127.0
    v = {"params": {"d": {"kernel": jnp.asarray(w),
                          "bias": v["params"]["d"]["bias"]}}}

    def apply_fn(vv, b, _apply):
        _apply(vv, b, train=False)

    scales = calibrate_act_scales(m, v, [x], apply_fn=apply_fn,
                                  prefixes=("d",), exclude_names=())
    assert scales["d"] == pytest.approx(1.0)
    ref = m.apply(v, x)
    with quantized_scope(scales, prefixes=("d",), exclude_names=()):
        q = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref), atol=1e-3)


def test_int8_predict_sharded_mesh(gdrn_setup):
    """int8 serving under a data mesh: the quantized program must compile
    and shard like the bf16 one (GSPMD over the 8-device CPU mesh)."""
    from jax.sharding import Mesh
    from gdrnet_tpu.engine.steps import make_predict_step
    from gdrnet_tpu.models.quantize import calibrate_act_scales

    cfg, model, variables, batch = gdrn_setup
    # batch of 8 so it shards evenly over the virtual devices
    batch8 = {k: jnp.concatenate([v, v], 0) for k, v in batch.items()}
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    scales = calibrate_act_scales(model, variables, [batch8])
    predict = make_predict_step(model, mesh=mesh, int8_scales=scales)
    out = predict(variables, batch8)
    assert np.isfinite(np.asarray(out["rot"])).all()
    assert out["rot"].shape == (8, 3, 3)
    # matches the unsharded int8 path
    ref = make_predict_step(model, int8_scales=scales)(variables, batch8)
    np.testing.assert_allclose(np.asarray(out["rot"], np.float32),
                               np.asarray(ref["rot"], np.float32),
                               atol=2e-2)
