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
