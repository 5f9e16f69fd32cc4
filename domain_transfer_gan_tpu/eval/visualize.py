"""Image-grid PNG writer reproducing the torchvision.utils.save_image
artifact contract used throughout the reference (normalize=True,
range=(-1,1), nrow=...) without any torch dependency.

All images are NHWC.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def one_to_three_channels(img: np.ndarray) -> np.ndarray:
    """Pad 1-channel images to 3 with zero channels (reference
    evaluate.py:155-161) — used for climate rasters."""
    img = np.asarray(img)
    if img.shape[-1] == 1:
        zeros = np.zeros_like(img)
        return np.concatenate([img, zeros, zeros], axis=-1)
    return img


def _to_uint8(img: np.ndarray, lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    img = np.clip((np.asarray(img, dtype=np.float32) - lo) / (hi - lo), 0, 1)
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_image_grid(images: np.ndarray, save_path: str, nrow: int = 8,
                    padding: int = 2, value_range=(-1.0, 1.0)):
    """Tile (N, H, W, C) images into a grid PNG, torchvision-style:
    `nrow` images per row, grey padding, values mapped from value_range."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[None]
    images = one_to_three_channels(images[..., :3])
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding, 3), dtype=np.uint8)
    grid[:] = 128
    u8 = _to_uint8(images, *value_range)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0:y0 + h, x0:x0 + w] = u8[i]
    from PIL import Image
    Image.fromarray(grid).save(save_path)


def interleave_columns(images: Sequence[np.ndarray]) -> np.ndarray:
    """Stack k same-shape (N, H, W, C) arrays so sample i's k versions are
    consecutive — the layout the reference builds with unsqueeze(1)+cat+view
    (train.py:47-59, evaluate.py:163-168)."""
    arrs = [np.asarray(a) for a in images]
    n = arrs[0].shape[0]
    stacked = np.stack(arrs, axis=1)  # (N, k, H, W, C)
    return stacked.reshape((n * len(arrs),) + arrs[0].shape[1:])


def visualize_data(opt, data: Sequence[np.ndarray], size, save_path: str):
    """Interleaved image-grid PNG (reference evaluate.py:163-168)."""
    imgs = [one_to_three_channels(np.asarray(d)[..., :3]) for d in data]
    grid = interleave_columns(imgs)
    save_image_grid(grid, save_path, nrow=len(imgs))


def multi_grid(opt, real_A, model, to_host=np.asarray) -> np.ndarray:
    """(real_A | num_multi samples over a shared z-set) grid body shared by
    the train and test CLIs (reference train.py:61-74 / test.py:176-190);
    callers own the save path and the multi-host fetch policy (to_host)."""
    import jax.numpy as jnp
    real_A = jnp.asarray(real_A)
    n = real_A.shape[0]
    z_set = model.sample_prior_z(opt.num_multi)
    multi_z = jnp.tile(z_set, (n, 1))
    multi_fake_B = np.asarray(to_host(model.generate_multi(real_A, multi_z)))
    # reshape with the GENERATED shape — output_nc can differ from input_nc
    # (e.g. climate: 4-channel forcings -> 1-channel SWE)
    multi_fake_B = multi_fake_B.reshape((n, opt.num_multi)
                                        + multi_fake_B.shape[1:])
    cols = [np.asarray(to_host(real_A))] + [multi_fake_B[:, i]
                                            for i in range(opt.num_multi)]
    return interleave_columns([one_to_three_channels(c[..., :3])
                               for c in cols])


def inference_grid(opt, real_A, real_B, model,
                   to_host=np.asarray) -> np.ndarray:
    """Posterior-z transfer grid (header row of B's + per-A rows) shared by
    the train and test CLIs (reference train.py:76-94)."""
    import jax.numpy as jnp
    real_A = jnp.asarray(real_A)
    real_B = jnp.asarray(real_B)[:opt.num_multi]
    n = real_A.shape[0]
    num = real_B.shape[0]  # may be < num_multi on small dev sets
    multi_fake_B = np.asarray(to_host(model.inference_multi(real_A, real_B)))
    multi_fake_B = multi_fake_B.reshape((n, num) + multi_fake_B.shape[1:])
    cols = [np.asarray(to_host(real_A))] + [multi_fake_B[:, i]
                                            for i in range(num)]
    body = interleave_columns([one_to_three_channels(c[..., :3])
                               for c in cols])
    header = np.concatenate(
        [np.ones((1,) + body.shape[1:], body.dtype),
         one_to_three_channels(np.asarray(to_host(real_B))[..., :3])], axis=0)
    return np.concatenate([header, body], axis=0), num
