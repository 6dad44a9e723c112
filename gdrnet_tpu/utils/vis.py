"""Visualization helpers (matplotlib/cv2, host-side).

Reference lib/vis_utils/image.py: grid_show (:31), vis_image_mask_bbox_cv2
(:113), vis_image_bboxes_cv2 (:146) and colormap.py — used by the dataset
test_vis() mains and TRAIN.VIS_IMG tensorboard panels.
"""

from __future__ import annotations

import numpy as np

_COLORS = np.array([
    [0.000, 0.447, 0.741], [0.850, 0.325, 0.098], [0.929, 0.694, 0.125],
    [0.494, 0.184, 0.556], [0.466, 0.674, 0.188], [0.301, 0.745, 0.933],
    [0.635, 0.078, 0.184], [0.300, 0.300, 0.300], [0.600, 0.600, 0.600],
    [1.000, 0.000, 0.000], [1.000, 0.500, 0.000], [0.749, 0.749, 0.000],
    [0.000, 1.000, 0.000], [0.000, 0.000, 1.000], [0.667, 0.000, 1.000],
])


def colormap(idx: int, bgr: bool = True, uint8: bool = True):
    c = _COLORS[idx % len(_COLORS)]
    if bgr:
        c = c[::-1]
    return (c * 255).astype(np.uint8).tolist() if uint8 else c


def grid_show(images, titles=None, row: int = 1, col: int | None = None,
              save_path: str | None = None, show: bool = False):
    """Matplotlib grid of images (reference grid_show, lib/vis_utils/
    image.py:31). Returns the figure; saves when save_path is given."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    col = col or -(-n // row)
    fig, axes = plt.subplots(row, col, squeeze=False, figsize=(3 * col, 3 * row))
    for i in range(row * col):
        ax = axes[i // col][i % col]
        ax.axis("off")
        if i < n:
            img = np.asarray(images[i])
            if img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8:
                img = img[..., ::-1]  # BGR -> RGB for display
            ax.imshow(img)
            if titles and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
    if show:
        plt.show()
    return fig


def vis_image_bboxes_cv2(img: np.ndarray, bboxes, labels=None,
                         thickness: int = 2) -> np.ndarray:
    """Draw xyxy boxes + labels (reference vis_image_bboxes_cv2, :146)."""
    import cv2

    out = np.ascontiguousarray(img.copy())
    for i, box in enumerate(bboxes):
        x1, y1, x2, y2 = [int(v) for v in box]
        color = colormap(i)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
        if labels is not None and i < len(labels):
            cv2.putText(out, str(labels[i]), (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def vis_image_mask_cv2(img: np.ndarray, mask: np.ndarray,
                       color_idx: int = 0, alpha: float = 0.5) -> np.ndarray:
    """Blend a binary mask over the image (vis_image_mask_bbox_cv2, :113)."""
    out = img.astype(np.float32).copy()
    color = np.asarray(colormap(color_idx), np.float32)
    m = mask.astype(bool)
    out[m] = out[m] * (1 - alpha) + color * alpha
    return out.astype(np.uint8)


def draw_projected_box3d(img: np.ndarray, corners_2d: np.ndarray,
                         color=None, thickness: int = 1) -> np.ndarray:
    """Draw a projected 3D box from its 8 projected corners (reference
    misc.draw_projected_box3d usage in dataset test_vis)."""
    import cv2

    out = np.ascontiguousarray(img.copy())
    color = color or colormap(3)
    c = corners_2d.astype(int)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for a, b in edges:
        cv2.line(out, tuple(c[a]), tuple(c[b]), color, thickness)
    return out


def vis_xyz_map(xyz: np.ndarray) -> np.ndarray:
    """Normalized XYZ map [H,W,3] in [0,1] -> uint8 RGB for panels."""
    return np.clip(np.asarray(xyz) * 255, 0, 255).astype(np.uint8)
