"""Anti-aliased batch resize matching the reference's skimage semantics.

The reference resizes with ``skimage.transform.resize`` (reference
dataloader.py:26-31, :255), which for downscaling applies a Gaussian
pre-filter with ``sigma = max(0, (downscale_factor - 1) / 2)`` per axis
(anti_aliasing default) before linear interpolation at half-pixel sample
centers.  skimage is not available in this environment; this module
reproduces the same pipeline from its documented primitives:

- Gaussian pre-blur via ``scipy.ndimage.gaussian_filter`` — the exact
  routine skimage delegates to — with boundary mode 'mirror' (skimage's
  'reflect' maps to ndimage 'mirror'),
- linear resampling via ``jax.image.resize(method='linear')``, which uses
  the same half-pixel (align_corners=False) convention as skimage's
  AffineTransform-based warp.

``antialias=False`` gives the plain bilinear path (round-1 behavior).
The divergence between the two is bounded by tests/test_data.py's
resize-parity cases and documented in PARITY.md.
"""

from __future__ import annotations

import numpy as np


def _antialias_sigma(in_size: int, out_size: int) -> float:
    """skimage's anti_aliasing_sigma: max(0, (factor - 1) / 2)."""
    factor = in_size / float(out_size)
    return max(0.0, (factor - 1.0) / 2.0)


def gaussian_blur_batch(arr: np.ndarray, sigma_h: float, sigma_w: float
                        ) -> np.ndarray:
    """Gaussian blur over the spatial axes of an NHWC batch (mirror edges)."""
    if sigma_h <= 0 and sigma_w <= 0:
        return arr
    from scipy import ndimage
    return ndimage.gaussian_filter(
        arr, sigma=(0.0, sigma_h, sigma_w, 0.0), mode="mirror")


def resize_batch(arr: np.ndarray, grid_size: int,
                 antialias: bool = True) -> np.ndarray:
    """Resize an NHWC batch to (grid_size, grid_size).

    With ``antialias`` (default, reference parity) a Gaussian pre-filter is
    applied when downscaling, exactly like skimage.transform.resize; without
    it this is plain bilinear interpolation.
    """
    if arr.shape[1] == grid_size and arr.shape[2] == grid_size:
        return np.asarray(arr, dtype=np.float32)
    plain_interp = False
    if antialias:
        sig_h = _antialias_sigma(arr.shape[1], grid_size)
        sig_w = _antialias_sigma(arr.shape[2], grid_size)
        arr = gaussian_blur_batch(np.asarray(arr, np.float32), sig_h, sig_w)
        # skimage interpolates plainly after its Gaussian pre-filter, so
        # jax.image.resize's own triangle filter must be off here; with
        # antialias=False we keep jax's default triangle filter (the
        # round-1 behavior).
        plain_interp = True

    import jax
    import jax.image

    out = jax.image.resize(
        jax.numpy.asarray(arr),
        (arr.shape[0], grid_size, grid_size, arr.shape[3]),
        method="linear",
        antialias=not plain_interp,
    )
    return np.asarray(out, dtype=np.float32)
