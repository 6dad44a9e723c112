"""BN folding: the folded variables must give the same inference outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from gdrnet_tpu.config import base_config
from gdrnet_tpu.models import build_model
from gdrnet_tpu.utils.fold_bn import fold_variables


def test_fold_bn_output_parity(rng):
    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    model = build_model(cfg)
    B = 2
    img = jnp.asarray(rng.rand(B, 256, 256, 3), jnp.float32)
    kwargs = dict(
        roi_classes=jnp.zeros(B, jnp.int32),
        roi_cams=jnp.tile(jnp.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0],
                                       [0, 0, 1]], jnp.float32), (B, 1, 1)),
        roi_centers=jnp.asarray(rng.rand(B, 2) * 300 + 100, jnp.float32),
        roi_whs=jnp.asarray(rng.rand(B, 2) * 80 + 50, jnp.float32),
        roi_extents=jnp.asarray(rng.rand(B, 3) * 0.1 + 0.05, jnp.float32),
        resize_ratios=jnp.asarray(rng.rand(B) + 0.5, jnp.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, img, **kwargs)

    # make BN stats non-trivial
    stats = jax.tree.map(
        lambda x: x + 0.3 * jnp.asarray(np.random.RandomState(1).rand(*x.shape),
                                        x.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    out_ref = model.apply(variables, img, **kwargs, train=False)
    folded = fold_variables(variables)
    # folded trees must drop into the same module
    out_fold = model.apply(
        {"params": jax.tree.map(jnp.asarray, folded["params"]),
         "batch_stats": jax.tree.map(jnp.asarray, folded["batch_stats"])},
        img, **kwargs, train=False)

    np.testing.assert_allclose(np.asarray(out_fold["rot"]),
                               np.asarray(out_ref["rot"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_fold["trans"]),
                               np.asarray(out_ref["trans"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_fold["mask"]),
                               np.asarray(out_ref["mask"]), atol=2e-3)
    # the fold actually changed the kernels (not a no-op)
    k0 = np.asarray(variables["params"]["backbone"]["conv1"]["kernel"])
    k1 = np.asarray(folded["params"]["backbone"]["conv1"]["kernel"])
    assert not np.allclose(k0, k1)


def test_fold_jit_matches_numpy(rng):
    """The jitted device-side fold must match the numpy fold exactly (the
    numpy path stays as the host-side golden)."""
    import jax
    import jax.numpy as jnp
    from gdrnet_tpu.utils.fold_bn import fold_batch_norms, fold_variables

    mean = rng.rand(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.5
    variables = {
        "params": {"block": {"Conv_0": {"kernel": rng.randn(3, 3, 4, 8).astype(np.float32)},
                             "BatchNorm_0": {"scale": rng.rand(8).astype(np.float32),
                                             "bias": rng.randn(8).astype(np.float32)}}},
        "batch_stats": {"block": {"BatchNorm_0": {"mean": mean, "var": var}}},
    }
    p_np, s_np = fold_batch_norms(variables["params"], variables["batch_stats"])
    folded = fold_variables(jax.tree.map(jnp.asarray, variables))
    np.testing.assert_allclose(
        np.asarray(folded["params"]["block"]["Conv_0"]["kernel"]),
        p_np["block"]["Conv_0"]["kernel"], rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(folded["params"]["block"]["BatchNorm_0"]["bias"]),
        p_np["block"]["BatchNorm_0"]["bias"], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(folded["batch_stats"]["block"]["BatchNorm_0"]["var"]),
        s_np["block"]["BatchNorm_0"]["var"])
