import time, numpy as np, jax, jax.numpy as jnp
from gdrnet_tpu.config import base_config
from gdrnet_tpu.models import build_model
from gdrnet_tpu.data import synthetic_roi_batch

B = 512
iters = 8
b = synthetic_roi_batch(batch_size=B)

def bench(model, img_dtype):
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["roi_img"] = batch["roi_img"].astype(img_dtype)
    kwargs = dict(roi_classes=batch["roi_classes"], roi_coord_2d=batch["roi_coord_2d"],
        roi_cams=batch["roi_cams"], roi_centers=batch["roi_centers"],
        roi_whs=batch["roi_whs"], roi_extents=batch["roi_extents"],
        resize_ratios=batch["resize_ratios"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch["roi_img"], **kwargs, train=False)
    @jax.jit
    def run(v, img):
        def body(c, _):
            out = model.apply(v, img + jnp.asarray(c, img.dtype) * jnp.asarray(1e-30, img.dtype), **kwargs, train=False)
            return jnp.sum(out["trans"][0].astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(run(variables, batch["roi_img"]))
    t0 = time.perf_counter(); float(run(variables, batch["roi_img"])); dt = time.perf_counter()-t0
    return B * iters / dt

cfg = base_config()
cfg.MODEL.CDPN.PNP_NET.WITH_2D_COORD = True
cfg.MODEL.CDPN.PNP_NET.REGION_ATTENTION = True
cfg.PARALLEL.DTYPE = "bfloat16"
m = build_model(cfg)
print(f"baseline f32 input: {bench(m, jnp.float32):.0f} crops/s", flush=True)
print(f"bf16 input:         {bench(m, jnp.bfloat16):.0f} crops/s", flush=True)
