"""Batched color augmentation on device (jax.random), completing the
INPUT.DEVICE_PREPROCESS split: with INPUT.DEVICE_COLOR_AUG the host stops
after decode + background replacement and the color jitter runs inside the
same XLA program as the crops/targets (data/device_pipeline.py).

Twins of the host augmentors (data/augment.py, themselves transcriptions of
the reference pipelines — AAE imgaug code base_data_loader.py:168-186,
ROI10D AugmentRGB core/utils/augment.py:7-60), with two deliberate
distribution upgrades over the host evaluation of the imgaug DSL:

* GaussianBlur sigma is drawn PER IMAGE in [0, 1.2) — the host pipeline
  fixes `1.2*np.random.rand()` once per run (parse_aug_code docstring).
* Saturation scales chroma in closed form (x' = max - f*(max - x), exactly
  HSV S*=f at fixed V for f<=1) instead of uint8 HSV round-trips.

All ops take [B, H, W, 3] float32 images in 0..255 (BGR or RGB — every op
is channel-order agnostic) and per-image parameters; "Sometimes(p, op)"
composes branchlessly with a per-image bernoulli select.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _clip(x):
    return jnp.clip(x, 0.0, 255.0)


def _rng_pair(v) -> tuple[float, float]:
    """imgaug stochastic parameter: scalar -> (v, v); (lo, hi) -> range
    (augment._rand_param semantics, sampled per image here)."""
    if isinstance(v, (tuple, list)) and len(v) == 2:
        return float(v[0]), float(v[1])
    return float(v), float(v)


def _pc_prob(per_channel) -> float:
    return 1.0 if per_channel is True else float(per_channel or 0.0)


def _sometimes(key, p: float, imgs, fn):
    """imgaug Sometimes: apply fn to each image independently w.p. p."""
    k_apply, k_op = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, p, (imgs.shape[0],))
    return jnp.where(apply[:, None, None, None], fn(k_op, imgs), imgs)


def _per_channel_value(key, lo, hi, b, per_channel_p: float):
    """imgaug per_channel semantics: w.p. per_channel_p draw one value per
    channel, else one shared value per image."""
    k_pc, k_ch, k_sh = jax.random.split(key, 3)
    pc = jax.random.bernoulli(k_pc, per_channel_p, (b, 1))
    v_ch = jax.random.uniform(k_ch, (b, 3), minval=lo, maxval=hi)
    v_sh = jax.random.uniform(k_sh, (b, 1), minval=lo, maxval=hi)
    return jnp.where(pc, v_ch, jnp.broadcast_to(v_sh, (b, 3)))


def add_batch(key, imgs, lo=-25.0, hi=25.0, per_channel=0.3):
    v = _per_channel_value(key, lo, hi, imgs.shape[0], per_channel)
    return _clip(imgs + v[:, None, None, :])


def multiply_batch(key, imgs, lo=0.8, hi=1.2, per_channel=0.5):
    v = _per_channel_value(key, lo, hi, imgs.shape[0], per_channel)
    return _clip(imgs * v[:, None, None, :])


def linear_contrast_batch(key, imgs, lo=0.5, hi=2.2, per_channel=0.3):
    """(x - 127) * alpha + 127 (augment.aug_contrast / _iaa_linear_contrast)."""
    a = _per_channel_value(key, lo, hi, imgs.shape[0], per_channel)
    return _clip((imgs - 127.0) * a[:, None, None, :] + 127.0)


def invert_batch(key, imgs, p=0.2, per_channel=True):
    """imgaug Invert (augment._iaa_invert): per image, w.p. per_channel the
    channels flip independently w.p. p, else the whole image flips w.p. p."""
    b = imgs.shape[0]
    k_pc, k_ch, k_im = jax.random.split(key, 3)
    pc = jax.random.bernoulli(k_pc, _pc_prob(per_channel), (b, 1))
    flip_ch = jax.random.bernoulli(k_ch, p, (b, 3))
    flip_im = jnp.broadcast_to(jax.random.bernoulli(k_im, p, (b, 1)), (b, 3))
    flip = jnp.where(pc, flip_ch, flip_im)[:, None, None, :]
    return jnp.where(flip, 255.0 - imgs, imgs)


def additive_gaussian_noise_batch(key, imgs, loc=0.0, scale=(0.0, 10.0)):
    """imgaug AdditiveGaussianNoise (augment._iaa_additive_gaussian_noise:
    full-shape noise; per-image scale drawn from the range)."""
    b = imgs.shape[0]
    k_s, k_l, k_n = jax.random.split(key, 3)
    s_lo, s_hi = _rng_pair(scale)
    l_lo, l_hi = _rng_pair(loc)
    s = jax.random.uniform(k_s, (b, 1, 1, 1), minval=s_lo, maxval=s_hi)
    mu = jax.random.uniform(k_l, (b, 1, 1, 1), minval=l_lo, maxval=l_hi)
    return _clip(imgs + jax.random.normal(k_n, imgs.shape) * s + mu)


def dropout_batch(key, imgs, p=0.05, per_channel=0.0):
    """imgaug Dropout (augment._iaa_dropout): per-pixel zeros, channel-shared
    unless the per-image per_channel draw fires."""
    b = imgs.shape[0]
    k_pc, k_px, k_ch, k_p = jax.random.split(key, 4)
    lo, hi = _rng_pair(p)
    pv = jax.random.uniform(k_p, (b, 1, 1, 1), minval=lo, maxval=hi)
    pc = jax.random.bernoulli(k_pc, _pc_prob(per_channel), (b, 1, 1, 1))
    keep_px = (jax.random.uniform(k_px, imgs.shape[:3])[..., None] >= pv)
    keep_ch = (jax.random.uniform(k_ch, imgs.shape) >= pv)
    return imgs * jnp.where(pc, keep_ch, keep_px)


def grayscale_batch(key, imgs, alpha=1.0, channel_order: str = "bgr"):
    """imgaug Grayscale (augment._iaa_grayscale): blend toward the luma.
    cv2 BGR2GRAY weights; pass channel_order='rgb' for flipped layouts."""
    b = imgs.shape[0]
    lo, hi = _rng_pair(alpha)
    a = jax.random.uniform(key, (b, 1, 1, 1), minval=lo, maxval=hi)
    w = jnp.asarray([0.114, 0.587, 0.299] if channel_order == "bgr"
                    else [0.299, 0.587, 0.114])
    g = jnp.sum(imgs * w, axis=-1, keepdims=True)
    return _clip((1.0 - a) * imgs + a * g)


def coarse_dropout_batch(key, imgs, p=0.2, size_percent=0.05, fill=0.0):
    """Drop coarse blocks: bernoulli grid at size_percent resolution,
    nearest-upsampled (augment.aug_coarse_dropout). p may be a range
    (sampled per image); size_percent must be static (grid shape)."""
    b, h, w, _ = imgs.shape
    sp = _rng_pair(size_percent)[1]  # static resolution: use the upper bound
    gh = max(2, int(h * sp))
    gw = max(2, int(w * sp))
    k_p, k_g = jax.random.split(key)
    lo, hi = _rng_pair(p)
    pv = jax.random.uniform(k_p, (b, 1, 1), minval=lo, maxval=hi)
    grid = jax.random.uniform(k_g, (b, gh, gw)) < pv
    mask = jax.image.resize(grid.astype(jnp.float32), (b, h, w), "nearest")
    return jnp.where(mask[..., None] > 0, fill, imgs)


def saturation_batch(key, imgs, lo=0.6, hi=1.4):
    """HSV S *= f at fixed V, closed form: x' = max - f*(max - x)
    (augment.aug_saturation without the uint8 HSV round-trip)."""
    f = jax.random.uniform(key, (imgs.shape[0], 1, 1, 1), minval=lo, maxval=hi)
    mx = imgs.max(axis=-1, keepdims=True)
    return _clip(mx - f * (mx - imgs))


def gaussian_blur_batch(key, imgs, sigma_hi=1.2, sigma_lo=0.0,
                        radius: int = 4):
    """Separable Gaussian blur with PER-IMAGE sigma in [sigma_lo, sigma_hi).
    sigma < ~0.35 rounds to identity via the normalized kernel itself
    (center tap -> 1). Depthwise convs, vmapped for per-image kernels."""
    b = imgs.shape[0]
    sigma = jax.random.uniform(key, (b,), minval=sigma_lo, maxval=sigma_hi)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    # guard sigma ~ 0: kernel collapses to the center tap
    s = jnp.maximum(sigma, 1e-3)[:, None]
    k = jnp.exp(-0.5 * (x[None, :] / s) ** 2)
    k = k / k.sum(axis=1, keepdims=True)  # [B, K]

    def blur_one(im, k1d):  # im [H, W, 3]
        # reflect-pad first (cv2 BORDER_DEFAULT semantics) — zero padding
        # would darken borders
        im = jnp.pad(im[None], ((0, 0), (radius, radius), (radius, radius),
                                (0, 0)), mode="reflect")
        kw = k1d.reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, 3))  # HWIO dw
        y = jax.lax.conv_general_dilated(
            im, kw, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
            precision="highest")  # TPU convs default bf16 (CLAUDE.md)
        kh = k1d.reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, 3))
        y = jax.lax.conv_general_dilated(
            y, kh, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
            precision="highest")
        return y[0]

    return jax.vmap(blur_one)(imgs, k)


def aae_aug_batch(key, imgs):
    """The AAE pipeline (augment.AAE_AUG_CODE / base_data_loader.py:168-186):
    Sometimes(0.5 CoarseDropout(0.2, 5%)), Sometimes(0.5 GaussianBlur),
    Sometimes(0.5 Add(+-25, pc 0.3)), Sometimes(0.3 Invert(0.2, pc)),
    Sometimes(0.5 Multiply(0.6-1.4, pc 0.5)), Sometimes(0.5 Multiply),
    Sometimes(0.5 LinearContrast(0.5-2.2, pc 0.3)); fixed order."""
    ks = jax.random.split(key, 7)
    imgs = _sometimes(ks[0], 0.5, imgs, partial(coarse_dropout_batch,
                                                p=0.2, size_percent=0.05))
    imgs = _sometimes(ks[1], 0.5, imgs, gaussian_blur_batch)
    imgs = _sometimes(ks[2], 0.5, imgs, partial(add_batch, lo=-25.0, hi=25.0,
                                                per_channel=0.3))
    imgs = _sometimes(ks[3], 0.3, imgs, partial(invert_batch, p=0.2,
                                                per_channel=True))
    imgs = _sometimes(ks[4], 0.5, imgs, partial(multiply_batch, lo=0.6,
                                                hi=1.4, per_channel=0.5))
    imgs = _sometimes(ks[5], 0.5, imgs, partial(multiply_batch, lo=0.6,
                                                hi=1.4, per_channel=0.0))
    imgs = _sometimes(ks[6], 0.5, imgs, partial(linear_contrast_batch,
                                                lo=0.5, hi=2.2,
                                                per_channel=0.3))
    return imgs


def roi10d_aug_batch(key, imgs, brightness=18.0, contrast=0.4,
                     saturation=0.4):
    """AugmentRGB jitter (augment.aug_roi10d, core/utils/augment.py:7-60):
    brightness add, linear contrast, saturation — all per image."""
    k1, k2, k3 = jax.random.split(key, 3)
    v = jax.random.uniform(k1, (imgs.shape[0], 1, 1, 1),
                           minval=-brightness, maxval=brightness)
    imgs = _clip(imgs + v)
    a = jax.random.uniform(k2, (imgs.shape[0], 1, 1, 1),
                           minval=1 - contrast, maxval=1 + contrast)
    imgs = _clip((imgs - 127.0) * a + 127.0)
    return saturation_batch(k3, imgs, lo=1 - saturation, hi=1 + saturation)


def _geometric_stub(name):
    def ctor(*a, **k):
        raise NotImplementedError(
            f"{name}: geometric color-aug ops would desync bbox/xyz/mask "
            "targets (the reference keeps them commented out in every "
            "shipped COLOR_AUG_CODE)")
    return ctor


def parse_device_aug_code(code: str, channel_order: str = "bgr"):
    """COLOR_AUG_CODE DSL string -> batched device op (key, imgs) -> imgs.

    Mirrors the host parser (augment.parse_aug_code / _AUG_NAMESPACE) against
    device constructors; ranges sample PER IMAGE (an upgrade over the host's
    once-per-run evaluation of np.random expressions — those still evaluate
    at parse here for compatibility, e.g. GaussianBlur(1.2*np.random.rand()))."""
    import numpy as np

    def Sequential(children, random_order=False):
        if random_order:
            raise NotImplementedError(
                "random_order=True has no fixed-program equivalent "
                "(no shipped COLOR_AUG_CODE uses it)")
        def op(key, imgs):
            for i, c in enumerate(children):
                imgs = c(jax.random.fold_in(key, i), imgs)
            return imgs
        return op

    def Sometimes(p, child):
        return lambda key, imgs: _sometimes(key, float(p), imgs, child)

    def OneOf(children):
        def op(key, imgs):
            k_sel, k_op = jax.random.split(key)
            sel = jax.random.randint(k_sel, (imgs.shape[0],), 0, len(children))
            outs = jnp.stack([c(jax.random.fold_in(k_op, i), imgs)
                              for i, c in enumerate(children)])  # [N,B,H,W,3]
            return jnp.take_along_axis(
                outs, sel[None, :, None, None, None], axis=0)[0]
        return op

    def CoarseDropout(p=0.1, size_percent=0.05, per_channel=0.0):
        # per_channel block patterns deliberately collapse to shared blocks
        # (visually equivalent occlusion; saves 3x the masks)
        return lambda key, imgs: coarse_dropout_batch(
            key, imgs, p=p, size_percent=size_percent)

    def GaussianBlur(sigma=1.0):
        lo, hi = _rng_pair(sigma)
        return lambda key, imgs: gaussian_blur_batch(
            key, imgs, sigma_lo=lo, sigma_hi=max(hi, lo + 1e-6))

    def Add(value=(-20, 20), per_channel=0.0):
        lo, hi = _rng_pair(value)
        return lambda key, imgs: add_batch(key, imgs, lo=lo, hi=hi,
                                           per_channel=_pc_prob(per_channel))

    def Multiply(mul=(0.8, 1.2), per_channel=0.0):
        lo, hi = _rng_pair(mul)
        return lambda key, imgs: multiply_batch(
            key, imgs, lo=lo, hi=hi, per_channel=_pc_prob(per_channel))

    def LinearContrast(alpha=(0.6, 1.4), per_channel=0.0):
        lo, hi = _rng_pair(alpha)
        return lambda key, imgs: linear_contrast_batch(
            key, imgs, lo=lo, hi=hi, per_channel=_pc_prob(per_channel))

    def Invert(p=0.5, per_channel=False):
        return lambda key, imgs: invert_batch(key, imgs, p=float(p),
                                              per_channel=per_channel)

    def AdditiveGaussianNoise(loc=0, scale=(0, 10), per_channel=0.0):
        return lambda key, imgs: additive_gaussian_noise_batch(
            key, imgs, loc=loc, scale=scale)

    def Dropout(p=0.05, per_channel=0.0):
        return lambda key, imgs: dropout_batch(key, imgs, p=p,
                                               per_channel=per_channel)

    def Grayscale(alpha=1.0):
        return lambda key, imgs: grayscale_batch(
            key, imgs, alpha=alpha, channel_order=channel_order)

    ns = {
        "Sequential": Sequential, "Sometimes": Sometimes, "OneOf": OneOf,
        "CoarseDropout": CoarseDropout, "GaussianBlur": GaussianBlur,
        "Add": Add, "Multiply": Multiply, "LinearContrast": LinearContrast,
        "ContrastNormalization": LinearContrast, "Invert": Invert,
        "AdditiveGaussianNoise": AdditiveGaussianNoise, "Dropout": Dropout,
        "Grayscale": Grayscale, "Noop": lambda *a, **k: (lambda key, imgs: imgs),
        "np": np,
    }
    for name in ("PerspectiveTransform", "CropAndPad", "Affine",
                 "PiecewiseAffine", "ElasticTransformation", "Fliplr",
                 "Flipud", "Crop", "Pad", "Scale", "Superpixels"):
        ns[name] = _geometric_stub(name)
    return eval(code, {"__builtins__": {}}, ns)  # noqa: S307 restricted ns


@partial(jax.jit, static_argnames=("aug_type", "prob", "aug_code",
                                   "channel_order"))
def apply_color_aug_batch(key, imgs, aug_ok, aug_type: str = "aae",
                          prob: float = 0.0, aug_code: str | None = None,
                          channel_order: str = "bgr"):
    """Top-level gate: each image augments w.p. `prob` AND when its
    `aug_ok` flag is set (host-computed COLOR_AUG_SYN_ONLY rule —
    mapper.py:210-216). imgs [B,H,W,3] f32 0..255. aug_type "code" parses
    INPUT.COLOR_AUG_CODE (falls back to the built-in AAE pipeline)."""
    if prob <= 0.0:
        return imgs
    t = aug_type.lower()
    if t == "code" and aug_code:
        pipeline = parse_device_aug_code(aug_code, channel_order)
        fn = pipeline
    elif t in ("aae", "code"):
        fn = aae_aug_batch
    elif t == "roi10d":
        fn = roi10d_aug_batch
    else:
        raise ValueError(
            f"device color aug supports aae/code/roi10d, got {aug_type!r} "
            "(keep INPUT.DEVICE_COLOR_AUG=False for ssd/albu)")
    k_p, k_op = jax.random.split(key)
    do = jax.random.bernoulli(k_p, prob, (imgs.shape[0],))
    do = do & (aug_ok.astype(bool))
    out = fn(k_op, imgs)
    return jnp.where(do[:, None, None, None], out, imgs)
