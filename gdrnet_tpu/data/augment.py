"""Host-side color augmentation + background replacement (numpy/cv2).

Covers the reference's augmentation surface (core/base_data_loader.py:154-259
_get_color_augmentor/_color_aug and :320-419 replace_bg/get_bg_image):

  * ROI10D AugmentRGB-style brightness/contrast/saturation/lighting jitter
    (core/utils/augment.py:7)
  * AAE-style pipeline (the imgaug Sequential the reference builds for
    aug_type "aae": blur, contrast, multiply, invert-channel, add) —
    reimplemented as deterministic-RNG numpy ops; distributional parity, not
    bitwise (imgaug RNG is not reproducible here, SURVEY.md §7 hard parts)
  * VOC/SUN/COCO background replacement with aspect-keeping resize and
    optional foreground truncation (TRUNCATE_FG)

Every op takes (img uint8 HWC BGR, rng: np.random.RandomState) and the
pipeline is applied with per-op probabilities, so a seeded RandomState makes
the whole mapper reproducible.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Callable

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# elementary color ops
# ---------------------------------------------------------------------------


def aug_brightness_add(img, rng, lo=-30, hi=30):
    return np.clip(img.astype(np.float32) + rng.uniform(lo, hi), 0, 255).astype(np.uint8)


def aug_multiply(img, rng, lo=0.8, hi=1.2, per_channel_p=0.5):
    if rng.rand() < per_channel_p:
        m = rng.uniform(lo, hi, size=(1, 1, img.shape[2]))
    else:
        m = rng.uniform(lo, hi)
    return np.clip(img.astype(np.float32) * m, 0, 255).astype(np.uint8)


def aug_contrast(img, rng, lo=0.5, hi=2.2):
    """LinearContrast: (x - 127) * alpha + 127."""
    alpha = rng.uniform(lo, hi)
    return np.clip((img.astype(np.float32) - 127.0) * alpha + 127.0, 0, 255).astype(np.uint8)


def aug_gaussian_blur(img, rng, sigma_lo=0.0, sigma_hi=1.2):
    sigma = rng.uniform(sigma_lo, sigma_hi)
    if sigma < 1e-3:
        return img
    k = max(3, int(2 * round(2 * sigma) + 1))
    return cv2.GaussianBlur(img, (k, k), sigma)


def aug_gaussian_noise(img, rng, scale=10.0):
    noise = rng.randn(*img.shape) * scale
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def aug_invert_channel(img, rng, p_channel=0.3):
    out = img.copy()
    for c in range(img.shape[2]):
        if rng.rand() < p_channel:
            out[..., c] = 255 - out[..., c]
    return out


def aug_saturation(img, rng, lo=0.5, hi=1.5):
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(lo, hi), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def aug_hue(img, rng, delta=18):
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int32)
    hsv[..., 0] = (hsv[..., 0] + rng.randint(-delta, delta + 1)) % 180
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def aug_coarse_dropout(img, rng, p_px=0.05, size_frac=0.05, fill=0):
    """Drop random coarse blocks (imgaug CoarseDropout analogue)."""
    h, w = img.shape[:2]
    gh = max(2, int(h * size_frac))
    gw = max(2, int(w * size_frac))
    grid = rng.rand(gh, gw) < p_px
    mask = cv2.resize(grid.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST)
    out = img.copy()
    out[mask.astype(bool)] = fill
    return out


def aug_roi10d(img, rng, brightness=18.0, contrast=0.4, saturation=0.4):
    """AugmentRGB-style jitter (reference core/utils/augment.py:7-60)."""
    img = aug_brightness_add(img, rng, -brightness, brightness)
    img = aug_contrast(img, rng, 1 - contrast, 1 + contrast)
    img = aug_saturation(img, rng, 1 - saturation, 1 + saturation)
    return img


def aug_aae(img, rng):
    """AAE-style heavy pipeline (base_data_loader.py:168-186 builds
    Sequential([Sometimes(blur/dropout/add/invert/multiply/contrast)]))."""
    if rng.rand() < 0.2:
        img = aug_gaussian_blur(img, rng, 0.0, 1.2)
    if rng.rand() < 0.5:
        img = aug_coarse_dropout(img, rng, p_px=0.08, size_frac=0.05)
    if rng.rand() < 0.5:
        img = aug_brightness_add(img, rng, -25, 25)
    if rng.rand() < 0.15:
        img = aug_invert_channel(img, rng, 0.5)
    if rng.rand() < 0.5:
        img = aug_multiply(img, rng, 0.6, 1.4)
    if rng.rand() < 0.5:
        img = aug_contrast(img, rng, 0.5, 2.2)
    return img


def aug_ssd(img, rng):
    """SSD-style photometric distortion (reference ColorAugSSDTransform,
    core/utils/ssd_color_transform.py:10): random brightness, contrast,
    saturation, hue in randomized order."""
    if rng.rand() < 0.5:
        img = aug_brightness_add(img, rng, -32, 32)
    if rng.rand() < 0.5:  # contrast-first or contrast-last ordering
        if rng.rand() < 0.5:
            img = aug_contrast(img, rng, 0.5, 1.5)
        img = aug_saturation(img, rng, 0.5, 1.5)
        img = aug_hue(img, rng, 18)
    else:
        img = aug_saturation(img, rng, 0.5, 1.5)
        img = aug_hue(img, rng, 18)
        if rng.rand() < 0.5:
            img = aug_contrast(img, rng, 0.5, 1.5)
    return img


def aug_albu(img, rng):
    """Numpy/cv2 equivalent of the reference's `code_albu` albumentations
    pipeline (base_data_loader.py:208-243): coarse dropout, noise, a blur
    family, CLAHE/sharpen/emboss/brightness-contrast, invert, RGB shift,
    contrast, gamma, brightness — same composition order and probabilities
    (bitwise RNG parity is impossible; distributional parity is the target,
    SURVEY hard-parts)."""
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    if rng.rand() < 0.4:  # CoarseDropout(max 5% holes of 5% size, p=0.4)
        img = aug_coarse_dropout(img, rng, p_px=0.03, size_frac=0.05)
    if rng.rand() < 0.2:  # OneOf additive noise
        img = aug_gaussian_noise(img, rng, scale=10.0)
    if rng.rand() < 0.2:  # OneOf[MotionBlur | MedianBlur(3) | Blur(3)]
        u = rng.rand()
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        if u < 0.5:  # motion blur: random-angle line kernel
            k = 2 * rng.randint(1, 3) + 1
            kern = np.zeros((k, k), np.float32)
            if rng.rand() < 0.5:
                kern[k // 2, :] = 1.0
            else:
                kern[:, k // 2] = 1.0
            img = cv2.filter2D(u8, -1, kern / kern.sum()).astype(np.float32)
        elif u < 0.75:
            img = cv2.medianBlur(u8, 3).astype(np.float32)
        else:
            img = cv2.blur(u8, (3, 3)).astype(np.float32)
    if rng.rand() < 0.3:  # OneOf[CLAHE | Sharpen | Emboss | Bright+Contrast]
        u = rng.rand()
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        if u < 0.25:
            lab = cv2.cvtColor(u8, cv2.COLOR_BGR2LAB)
            lab[..., 0] = cv2.createCLAHE(clipLimit=2.0).apply(lab[..., 0])
            img = cv2.cvtColor(lab, cv2.COLOR_LAB2BGR).astype(np.float32)
        elif u < 0.5:  # sharpen
            kern = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]],
                            np.float32)
            img = cv2.filter2D(u8, -1, kern).astype(np.float32)
        elif u < 0.75:  # emboss blended with identity
            kern = np.array([[-1, -1, 0], [-1, 1, 1], [0, 1, 1]], np.float32)
            emb = cv2.filter2D(u8, -1, kern).astype(np.float32)
            a = rng.uniform(0.2, 0.5)
            img = (1 - a) * img + a * emb
        else:
            img = aug_contrast(aug_brightness_add(img, rng), rng,
                               lo=0.8, hi=1.2)
    if rng.rand() < 0.2:  # InvertImg
        img = 255.0 - img
    if rng.rand() < 0.5:  # RGBShift(105/45/40) — img is BGR
        shift = np.array([rng.uniform(-40, 40), rng.uniform(-45, 45),
                          rng.uniform(-105, 105)], np.float32)
        img = img + shift[None, None]
    if rng.rand() < 0.5:  # RandomContrast(0.9)
        img = aug_contrast(img, rng, lo=0.1, hi=1.9)
    if rng.rand() < 0.5:  # RandomGamma(80..120)
        gamma = rng.uniform(0.8, 1.2)
        img = 255.0 * (np.clip(img, 0, 255) / 255.0) ** gamma
    if rng.rand() < 0.5:  # RandomBrightness(1.2)
        img = img * (1.0 + rng.uniform(-0.5, 0.5))
    return np.clip(img, 0, 255)


def build_color_augmentor(aug_type: str = "ROI10D") -> Callable:
    key = aug_type.lower()
    if key in ("roi10d",):
        return aug_roi10d
    if key in ("aae", "code"):  # code pipelines approximate AAE
        return aug_aae
    if key in ("albu", "code_albu"):
        return aug_albu
    if key in ("ssd",):
        return aug_ssd
    raise ValueError(f"Unknown color aug type: {aug_type}")


# ---------------------------------------------------------------------------
# background replacement (base_data_loader.py:320-419)
# ---------------------------------------------------------------------------


class BackgroundReplacer:
    def __init__(self, bg_root: str, num_bg_imgs: int = 10000,
                 keep_aspect: bool = True, bg_type: str = "VOC_table",
                 exts=(".jpg", ".jpeg", ".png")):
        self.keep_aspect = keep_aspect
        self.paths: list[str] = []
        if bg_root and osp.isdir(bg_root):
            # VOC layout: JPEGImages under root; else flat folder
            img_dir = osp.join(bg_root, "JPEGImages")
            if not osp.isdir(img_dir):
                img_dir = bg_root
            for fn in sorted(os.listdir(img_dir))[: num_bg_imgs]:
                if fn.lower().endswith(exts):
                    self.paths.append(osp.join(img_dir, fn))

    def get_bg(self, rng, h: int, w: int) -> np.ndarray:
        """Aspect-keeping random crop/resize of a random bg image
        (get_bg_image, base_data_loader.py:366-419)."""
        if not self.paths:
            # deterministic fallback: smooth random gradient
            gy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
            gx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
            c = rng.rand(1, 1, 3).astype(np.float32)
            return np.clip(gy * c + gx * (1 - c), 0, 255).astype(np.uint8)
        path = self.paths[rng.randint(len(self.paths))]
        bg = cv2.imread(path, cv2.IMREAD_COLOR)
        if bg is None:
            return self.get_bg(rng, h, w)
        if self.keep_aspect:
            bh, bw = bg.shape[:2]
            scale = max(h / bh, w / bw)
            bg = cv2.resize(bg, (int(np.ceil(bw * scale)), int(np.ceil(bh * scale))))
            y0 = rng.randint(0, bg.shape[0] - h + 1)
            x0 = rng.randint(0, bg.shape[1] - w + 1)
            return bg[y0:y0 + h, x0:x0 + w]
        return cv2.resize(bg, (w, h))

    def replace(self, img: np.ndarray, fg_mask: np.ndarray, rng,
                truncate_fg: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """Replace everything outside fg_mask with a random background;
        optionally truncate a random side of the fg first (replace_bg +
        TRUNCATE_FG, base_data_loader.py:320-364). Returns (img, mask)."""
        h, w = img.shape[:2]
        mask = fg_mask.astype(bool).copy()
        if truncate_fg and mask.any():
            ys, xs = np.nonzero(mask)
            x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
            side = rng.randint(4)
            if x2 > x1 and y2 > y1:
                if side == 0:
                    mask[:, : rng.randint(x1, (x1 + x2) // 2 + 1)] = False
                elif side == 1:
                    mask[:, rng.randint((x1 + x2) // 2, x2 + 1):] = False
                elif side == 2:
                    mask[: rng.randint(y1, (y1 + y2) // 2 + 1), :] = False
                else:
                    mask[rng.randint((y1 + y2) // 2, y2 + 1):, :] = False
        bg = self.get_bg(rng, h, w)
        out = np.where(mask[..., None], img, bg)
        return out, mask.astype(np.float32)
