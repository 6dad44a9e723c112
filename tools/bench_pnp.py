"""PnP post-processing throughput: host cv2 loop vs the device bucket program
(TEST.DEVICE_PNP, ops/device_pnp.py). One JSON line per path.

The device timing chains iterations on device with a data-dependent carry
(each round's refined pose seeds the next round's net pose) and fences with a
host fetch — `block_until_ready` alone is not a reliable fence over the axon
tunnel (CLAUDE.md). The host path is the reference's per-ROI
cv2.solvePnPRansac loop (gdrn_evaluator.py:316-435 semantics, eval/pnp.py).

Usage: python tools/bench_pnp.py [--batch 64] [--iters 4] [--mode ransac_pnp]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--mode", default="ransac_pnp")
    p.add_argument("--skip-host", action="store_true")
    args = p.parse_args(argv)

    import numpy as np

    from gdrnet_tpu.data.synthetic import synthetic_decoded_maps

    rng = np.random.RandomState(0)
    B = args.batch
    mask, xyzn, c2d, R_gt, t_gt, K, extent, (im_w, im_h) = \
        synthetic_decoded_maps(rng, B, noise_px=0.5, t_jitter=0.02)

    if not args.skip_host:
        from gdrnet_tpu.eval.pnp import correspondences_from_maps, pnp_ransac

        t0 = time.perf_counter()
        for j in range(B):
            img_pts, mdl_pts = correspondences_from_maps(
                mask[j], xyzn[j], c2d[j], im_w, im_h, extent)
            pnp_ransac(mdl_pts, img_pts, K, method="epnp", ransac=True)
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": "pnp_host_cv2", "value": B / dt,
                          "unit": "rois/s", "batch": B}), flush=True)

    from gdrnet_tpu.utils.device_probe import probe_device

    probe_device()  # the tunnel can hang at backend init; don't bind blind

    import jax
    import jax.numpy as jnp

    from gdrnet_tpu.ops.device_pnp import pnp_from_maps_batch

    fn_kwargs = dict(mode=args.mode, mask_thr=0.5)
    inputs = (jnp.asarray(mask), jnp.asarray(xyzn), jnp.asarray(c2d),
              jnp.asarray(np.tile([[float(im_w), float(im_h)]], (B, 1)),
                          jnp.float32),
              jnp.asarray(np.tile(extent, (B, 1))),
              jnp.asarray(np.tile(K, (B, 1, 1))))
    valid = jnp.ones(B, bool)

    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def chained(key, rot0, trans0, n):
        def body(carry, i):
            rot, trans = carry
            R, t = pnp_from_maps_batch(
                jax.random.fold_in(key, i), *inputs, rot, trans, valid,
                **fn_kwargs)
            return (R, t), None

        (R, t), _ = jax.lax.scan(body, (rot0, trans0), jnp.arange(n))
        return R, t

    rot0 = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    trans0 = jnp.asarray(np.tile([[0.0, 0.0, 0.5]], (B, 1)), jnp.float32)
    # warmup with the SAME static n as the timed call: n is a static argname,
    # so a different value would leave the timed program's compile in-window
    R, t = chained(jax.random.PRNGKey(0), rot0, trans0, args.iters)
    np.asarray(t)
    t0 = time.perf_counter()
    R, t = chained(jax.random.PRNGKey(1), rot0, trans0, args.iters)
    t_host = np.asarray(t)  # fence
    dt = time.perf_counter() - t0
    assert np.isfinite(t_host).all()
    print(json.dumps({"metric": f"pnp_device_{args.mode}",
                      "value": B * args.iters / dt, "unit": "rois/s",
                      "batch": B, "backend": jax.default_backend()}),
          flush=True)


if __name__ == "__main__":
    main()
