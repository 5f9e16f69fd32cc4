"""Fréchet distance quality metric with pluggable feature extractors.

The canonical FID uses InceptionV3 pool3 features; this environment has no
network egress and no pretrained vision weights, so the default extractor is
a **fixed-seed random convolutional network** — a documented proxy
("random-feature FID"): Fréchet distances under random conv features
correlate well with Inception FID for ranking models on the same data
distribution, and the fixed seed makes the number reproducible across runs
and models.  Pass any callable `(N, H, W, 3) -> (N, D)` as `extractor` to
use real Inception features when available.

The reference has no FID machinery at all (SURVEY.md §6); this implements
the quality-parity metric named in BASELINE.md.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from scipy import linalg

import jax
import jax.numpy as jnp
from flax import linen as nn


class _RandomFeatureNet(nn.Module):
    """Fixed random conv stack: 4x (conv3x3 s2 + leaky relu), global mean."""

    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        for i, ch in enumerate((w, 2 * w, 4 * w, 4 * w)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return jnp.mean(x, axis=(1, 2))


_EXTRACTOR_CACHE = {}


def random_feature_extractor(width: int = 64, seed: int = 1234,
                             batch: int = 64) -> Callable:
    """Deterministic random-conv feature extractor (N,H,W,3)->(N, 4*width)."""
    key = ("rf", width, seed)

    def make(sample_shape):
        net = _RandomFeatureNet(width)
        variables = net.init(jax.random.PRNGKey(seed),
                             jnp.zeros((1,) + sample_shape, jnp.float32))
        f = jax.jit(lambda x: net.apply(variables, x))
        return f

    def extract(images) -> np.ndarray:
        images = np.asarray(images, dtype=np.float32)
        ck = key + (images.shape[1:],)
        if ck not in _EXTRACTOR_CACHE:
            _EXTRACTOR_CACHE[ck] = make(images.shape[1:])
        f = _EXTRACTOR_CACHE[ck]
        outs = []
        for i in range(0, len(images), batch):
            outs.append(np.asarray(f(jnp.asarray(images[i:i + batch]))))
        return np.concatenate(outs, axis=0)

    return extract


def save_extractor(fn: Callable, sample_shape, path: str,
                   batch: int = 64) -> None:
    """Serialize a feature extractor to a self-contained artifact.

    ``fn`` is any jax-traceable ``(batch, H, W, C) -> (batch, D)`` callable
    (e.g. an Inception network with pretrained weights closed over as
    constants).  It is traced at a fixed batch and written via jax.export
    (StableHLO), so the artifact loads without the defining code —
    the escape hatch that gets TRUE Inception FID into environments that
    have weights but not this module's dependencies.
    """
    from jax import export as jax_export

    spec = jax.ShapeDtypeStruct((batch,) + tuple(sample_shape), jnp.float32)
    exp = jax_export.export(jax.jit(fn))(spec)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_extractor(path: str) -> Callable:
    """Load a :func:`save_extractor` artifact as an extractor callable
    (``--fid_extractor PATH`` in the test CLI).

    The serialized function has a fixed traced batch; inputs are fed in
    chunks of that batch (the final chunk zero-padded and trimmed), so the
    returned callable accepts any N.
    """
    from jax import export as jax_export

    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    (aval,) = exp.in_avals
    fixed_batch = aval.shape[0]
    sample_shape = tuple(aval.shape[1:])

    def extract(images) -> np.ndarray:
        images = np.asarray(images, dtype=np.float32)
        if images.shape[1:] != sample_shape:
            raise ValueError(
                "extractor %s was traced for %s images, got %s"
                % (path, sample_shape, images.shape[1:]))
        outs = []
        for i in range(0, len(images), fixed_batch):
            chunk = images[i:i + fixed_batch]
            n = len(chunk)
            if n < fixed_batch:
                chunk = np.concatenate(
                    [chunk, np.zeros((fixed_batch - n,) + sample_shape,
                                     np.float32)])
            out = np.asarray(exp.call(jnp.asarray(chunk)))
            outs.append(out[:n])
        return np.concatenate(outs, axis=0)

    return extract


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(features: np.ndarray):
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def compute_fid(real_images, fake_images,
                extractor: Optional[Callable] = None) -> float:
    """Fréchet distance between feature distributions of two image sets.

    Images are NHWC in [-1, 1].  With the default extractor this is
    proxy-FID (random features) — comparable across models/checkpoints
    evaluated with the same seed, not comparable to published Inception
    FID numbers.
    """
    extractor = extractor or random_feature_extractor()
    f_real = extractor(real_images)
    f_fake = extractor(fake_images)
    mu1, s1 = activation_statistics(f_real)
    mu2, s2 = activation_statistics(f_fake)
    return frechet_distance(mu1, s1, mu2, s2)


def eval_fid_B(dataset, model, n_max: int = 2048,
               extractor: Optional[Callable] = None,
               rng_seed: Optional[int] = None) -> float:
    """Proxy-FID of generated B (from A with prior z) against real B.

    With rng_seed set, the prior z draws come from a dedicated key so the
    score is reproducible regardless of the model's RNG state; by default
    they consume the model's stream (matching training-time draws)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(rng_seed) if rng_seed is not None else None
    reals, fakes = [], []
    n = 0
    for batch in dataset:
        real_A = jnp.asarray(batch["A"])
        if key is not None:
            key, k = jax.random.split(key)
            z = jax.random.normal(k, (real_A.shape[0], model.opt.nlatent))
        else:
            z = model.sample_prior_z(real_A.shape[0])
        fake_B = model.predict_B(real_A, z)
        reals.append(np.asarray(batch["B"]))
        fakes.append(np.asarray(fake_B))
        n += real_A.shape[0]
        if n >= n_max:
            break
    return compute_fid(np.concatenate(reals)[:n_max],
                       np.concatenate(fakes)[:n_max], extractor)
