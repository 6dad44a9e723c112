"""Device color aug (data/device_augment.py): op semantics, gating,
determinism, and distributional agreement with the host augmentors
(data/augment.py) that it twins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdrnet_tpu.data.device_augment import (
    aae_aug_batch,
    add_batch,
    apply_color_aug_batch,
    coarse_dropout_batch,
    gaussian_blur_batch,
    invert_batch,
    linear_contrast_batch,
    multiply_batch,
    roi10d_aug_batch,
    saturation_batch,
)


def _imgs(rng, b=8, h=32, w=32):
    return jnp.asarray(rng.randint(0, 256, (b, h, w, 3)).astype(np.float32))


def test_op_semantics(rng):
    imgs = _imgs(rng)
    key = jax.random.PRNGKey(0)

    # invert with p=1: exact complement
    out = np.asarray(invert_batch(key, imgs, p=1.0, per_channel=False))
    np.testing.assert_allclose(out, 255.0 - np.asarray(imgs))

    # saturation: gray images are invariant; f scales chroma exactly
    gray = jnp.full((4, 8, 8, 3), 99.0)
    np.testing.assert_allclose(
        np.asarray(saturation_batch(key, gray)), np.asarray(gray))
    px = jnp.asarray([[[[40.0, 100.0, 200.0]]]])
    out = np.asarray(saturation_batch(key, px, lo=0.5, hi=0.5))[0, 0, 0]
    # x' = mx - 0.5*(mx - x): chroma (mx-mn) halves, V fixed
    np.testing.assert_allclose(out, [120.0, 150.0, 200.0])

    # coarse dropout: zero fraction ~ p (blocks are bernoulli at grid res;
    # 16 imgs x 10x10 grid -> 1600 draws, sd ~ 1%)
    big = jnp.full((16, 100, 100, 3), 200.0)
    out = np.asarray(coarse_dropout_batch(key, big, p=0.2, size_percent=0.1))
    frac = (out == 0).mean()
    assert 0.15 < frac < 0.25, frac

    # blur: constant image unchanged; noise variance shrinks, mean kept
    const = jnp.full((4, 16, 16, 3), 77.0)
    np.testing.assert_allclose(
        np.asarray(gaussian_blur_batch(key, const)), 77.0, atol=1e-3)
    noise = _imgs(rng, b=4)
    blurred = np.asarray(gaussian_blur_batch(jax.random.PRNGKey(3), noise))
    assert abs(blurred.mean() - np.asarray(noise).mean()) < 2.0
    assert blurred.std() <= np.asarray(noise).std() + 1e-3

    # contrast formula
    out = np.asarray(linear_contrast_batch(key, jnp.full((2, 4, 4, 3), 227.0),
                                           lo=2.0, hi=2.0, per_channel=0.0))
    np.testing.assert_allclose(out, 255.0)  # (227-127)*2+127 = 327 -> clip

    # add/multiply stay in range and move pixels
    for fn in (add_batch, multiply_batch):
        out = np.asarray(fn(key, imgs))
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert np.abs(out - np.asarray(imgs)).max() > 0


def test_determinism_and_gating(rng):
    imgs = _imgs(rng, b=6)
    key = jax.random.PRNGKey(5)
    ok = jnp.asarray([1, 1, 1, 0, 0, 1], jnp.uint8)
    a = np.asarray(apply_color_aug_batch(key, imgs, ok, "aae", 1.0))
    b = np.asarray(apply_color_aug_batch(key, imgs, ok, "aae", 1.0))
    np.testing.assert_array_equal(a, b)  # same key -> same output
    # gated-off images untouched; at prob=1 at least one gated-on changes
    np.testing.assert_array_equal(a[3], np.asarray(imgs)[3])
    np.testing.assert_array_equal(a[4], np.asarray(imgs)[4])
    assert np.abs(a[[0, 1, 2, 5]] - np.asarray(imgs)[[0, 1, 2, 5]]).max() > 0
    # prob=0 is the identity
    c = np.asarray(apply_color_aug_batch(key, imgs, ok, "aae", 0.0))
    np.testing.assert_array_equal(c, np.asarray(imgs))
    with pytest.raises(ValueError, match="ssd"):
        apply_color_aug_batch(key, imgs, ok, "ssd", 0.5)


@pytest.mark.parametrize("aug_type", ["aae", "roi10d"])
def test_distribution_matches_host(rng, aug_type):
    """Aggregate statistics of the device aug match the host augmentor it
    twins (same base image, many independent draws)."""
    from gdrnet_tpu.data.augment import build_color_augmentor

    base = rng.randint(40, 216, (48, 48, 3)).astype(np.uint8)
    n = 256
    host_fn = build_color_augmentor(aug_type.upper() if aug_type == "roi10d"
                                    else aug_type)
    host_rng = np.random.RandomState(7)
    host = np.stack([host_fn(base, host_rng) for _ in range(n)]).astype(
        np.float32)

    imgs = jnp.asarray(np.repeat(base[None].astype(np.float32), n, axis=0))
    dev = np.asarray(apply_color_aug_batch(
        jax.random.PRNGKey(11), imgs, jnp.ones((n,), jnp.uint8),
        aug_type, 1.0))

    # means/stds of the augmented population agree within a few gray levels
    assert abs(host.mean() - dev.mean()) < 8.0, (host.mean(), dev.mean())
    assert abs(host.std() - dev.std()) < 12.0, (host.std(), dev.std())
    if aug_type == "aae":
        # per-image means spread comparably (Add/Multiply/Contrast mix)
        hs = host.mean(axis=(1, 2, 3)).std()
        ds = dev.mean(axis=(1, 2, 3)).std()
        assert abs(hs - ds) / max(hs, 1e-6) < 0.4, (hs, ds)
        # CoarseDropout: exact-zero pixels appear in both at similar rates
        hz = (host == 0).any(axis=-1).mean()
        dz = (dev == 0).any(axis=-1).mean()
        assert abs(hz - dz) < 0.07, (hz, dz)


def test_dsl_parser(rng):
    """parse_device_aug_code: the COLOR_AUG_CODE DSL builds batched device
    pipelines (same restricted namespace as the host parser)."""
    from gdrnet_tpu.data.augment import AAE_AUG_CODE
    from gdrnet_tpu.data.device_augment import parse_device_aug_code

    imgs = _imgs(rng, b=6)
    key = jax.random.PRNGKey(4)

    # the built-in AAE code string parses and perturbs images in range
    fn = parse_device_aug_code(AAE_AUG_CODE)
    out = np.asarray(fn(key, imgs))
    assert out.shape == imgs.shape and np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 255.0
    assert np.abs(out - np.asarray(imgs)).max() > 0

    # custom code with OneOf / Dropout / Grayscale / noise / parse-time np
    code = ("Sequential(["
            "OneOf([Grayscale(alpha=1.0), Invert(1.0)]),"
            "Dropout(0.5),"
            "AdditiveGaussianNoise(scale=(0, 5.0)),"
            "GaussianBlur(1.2*np.random.rand())"
            "], random_order=False)")
    out2 = np.asarray(parse_device_aug_code(code)(key, imgs))
    assert np.isfinite(out2).all() and out2.shape == imgs.shape
    # Dropout(0.5) zeroes roughly half the pixels pre-noise/blur
    assert np.abs(out2 - np.asarray(imgs)).mean() > 10.0

    # grayscale channel-order: a pure-"red" pixel keeps cv2 BGR weights
    red = jnp.zeros((1, 2, 2, 3)).at[..., 2].set(200.0)  # BGR: ch2 = R
    g_bgr = np.asarray(parse_device_aug_code(
        "Grayscale(alpha=1.0)", "bgr")(key, red))
    g_rgb = np.asarray(parse_device_aug_code(
        "Grayscale(alpha=1.0)", "rgb")(key, red))
    np.testing.assert_allclose(g_bgr[0, 0, 0], 200 * 0.299, atol=1e-3)
    np.testing.assert_allclose(g_rgb[0, 0, 0], 200 * 0.114, atol=1e-3)

    # geometric ops and random_order fail loudly
    with pytest.raises(NotImplementedError, match="desync"):
        parse_device_aug_code("Sequential([Fliplr(0.5)])")(key, imgs)
    with pytest.raises(NotImplementedError, match="random_order"):
        parse_device_aug_code("Sequential([Noop()], random_order=True)")(
            key, imgs)

    # the "code" route through the public gate
    from gdrnet_tpu.data.device_augment import apply_color_aug_batch
    out3 = np.asarray(apply_color_aug_batch(
        key, imgs, jnp.ones((6,), jnp.uint8), "code", 1.0,
        aug_code="Sequential([Invert(1.0)])"))
    np.testing.assert_allclose(out3, 255.0 - np.asarray(imgs))


def test_device_train_batch_with_color_aug(rng):
    """device_train_batch(color_aug_type=...) augments eligible frames
    inside the pipeline; gated frames produce identical roi_img to the
    no-aug run."""
    from gdrnet_tpu.data.device_pipeline import device_train_batch
    from gdrnet_tpu.data.synthetic import synthetic_raw_batch

    raw_np, stacks_np = synthetic_raw_batch(batch_size=4)
    raw = {k: jnp.asarray(v) for k, v in raw_np.items()}
    raw["aug_ok"] = jnp.asarray([1, 1, 0, 0], jnp.uint8)
    stacks = {k: jnp.asarray(v) for k, v in stacks_np.items()}
    args = (stacks["points_stack"], stacks["extents_stack"],
            stacks["fps_stack"], stacks["sym_rots_stack"],
            stacks["sym_mask_stack"], jnp.zeros(3), jnp.ones(3))
    kw = dict(input_res=64, out_res=16, dzi_type="none")
    plain = device_train_batch(jax.random.PRNGKey(2), raw, *args, **kw)
    auged = device_train_batch(jax.random.PRNGKey(2), raw, *args,
                               color_aug_type="aae", color_aug_prob=1.0, **kw)
    p = np.asarray(plain["roi_img"])
    a = np.asarray(auged["roi_img"])
    assert np.abs(a[:2] - p[:2]).max() > 0        # eligible frames augmented
    np.testing.assert_array_equal(a[2:], p[2:])   # gated frames untouched
    for k in ("gt_xyz", "gt_region", "gt_trans_ratio"):  # targets unaffected
        np.testing.assert_array_equal(np.asarray(auged[k]),
                                      np.asarray(plain[k]))
    assert np.all(np.isfinite(a))
