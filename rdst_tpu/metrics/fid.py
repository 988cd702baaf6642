"""Fréchet Inception Distance.

The reference (/root/reference/metrics/fid.py:8-195) scores activations
from an InceptionV3 pool3 head whose weights ship as a stripped blob
(.MISSING_LARGE_BLOBS:10). Here the Fréchet math is native, and the
feature extractor is pluggable:

* if an inception weights file is present (``RDST_TPU_INCEPTION_PT`` env
  var or ``rdst_tpu/metrics/pt_inception-2015-12-05-6726825d.pth``) it is
  loaded through the torch-import bridge (metrics/inception.py,
  roundtrip-tested);
* else the committed natively-trained VGG substitute
  (``weights/vgg19_features_native.pkl``) provides learned pooled
  features;
* a fixed random-projection + pooling extractor is the last resort.
  Both fallbacks keep the metric *monotone and comparable within a run*
  (identical distributions -> 0) while being explicit — a one-time
  warning is emitted — that the values are not comparable to published
  Inception-based FIDs.

Grayscale inputs are replicated to 3 channels per the reference
(fid.py:169-195), and channel-mean FID is returned for C>3 stacks.
"""

from __future__ import annotations

import os
import warnings
from typing import List

import numpy as np
from scipy import linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (with sqrtm stabilization)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    if not (np.isfinite(sigma1).all() and np.isfinite(sigma2).all()
            and np.isfinite(diff).all()):
        # nan-poisoned predictions must not kill the whole evaluation
        # (observed: a diverged run's final eva died inside sqrtm)
        warnings.warn("frechet_distance: non-finite moments; returning nan")
        return float("nan")
    try:
        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    except linalg.LinAlgError as e:
        warnings.warn(f"frechet_distance: sqrtm failed ({e}); returning nan")
        return float("nan")
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"sqrtm returned significant imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class _RandomProjectionFeatures:
    """Deterministic conv-pool random features (Inception-free fallback)."""

    def __init__(self, dim: int = 256, patch: int = 16, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.patch = patch
        self.w = rng.normal(0, 1.0 / patch, (dim, 3 * patch * patch)).astype(np.float32)

    def __call__(self, imgs: List[np.ndarray]) -> np.ndarray:
        feats = []
        p = self.patch
        for img in imgs:
            img = np.asarray(img, dtype=np.float32)
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            h, w = img.shape[:2]
            hh, ww = (h // p) * p, (w // p) * p
            x = img[:hh, :ww, :3].reshape(hh // p, p, ww // p, p, 3)
            x = x.transpose(0, 2, 4, 1, 3).reshape(-1, 3 * p * p)
            z = np.maximum(x @ self.w.T, 0)
            feats.append(z.mean(axis=0))
        return np.stack(feats)


class _NativeVGGFeatures:
    """Learned fallback: pooled features from the natively-trained VGG
    substitute (weights/vgg19_features_native.pkl, see
    runners/train_vgg_features.py). Values are still not comparable to
    published Inception FIDs, but the embedding is a LEARNED structural
    one rather than a random projection."""

    def __init__(self, variables, width: float, batch_size: int = 16):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.losses.vgg import _TAPS, VGG19Features

        model = VGG19Features(tap=_TAPS["54"], width=width)
        self.batch_size = batch_size

        @jax.jit
        def feats(x):
            f = model.apply(variables, x)
            return jnp.mean(f, axis=(1, 2))  # global average pool

        self._feats = feats
        self._jnp = jnp

    def __call__(self, imgs: List[np.ndarray]) -> np.ndarray:
        jnp = self._jnp
        out = []
        for i in range(0, len(imgs), self.batch_size):
            block = []
            for img in imgs[i:i + self.batch_size]:
                img = np.asarray(img, dtype=np.float32)
                if img.ndim == 2:
                    img = img[:, :, None]
                if img.shape[-1] == 1:
                    img = np.repeat(img, 3, axis=-1)
                block.append(img[..., :3])
            h = min(b.shape[0] for b in block)
            w = min(b.shape[1] for b in block)
            x = jnp.asarray(np.stack([b[:h, :w] for b in block]))
            out.append(np.asarray(self._feats(x)))
        return np.concatenate(out)


_warned = False


class FID:
    """Callable FID(gts, preds) over lists of HWC images."""

    def __init__(self, gpu_id: int = -1, block_idx: int = 3, batch_size: int = 16):
        global _warned
        self.extractor = None
        weights = os.environ.get(
            "RDST_TPU_INCEPTION_PT",
            os.path.join(os.path.dirname(__file__), "pt_inception-2015-12-05-6726825d.pth"),
        )
        if os.path.exists(weights):
            try:
                from rdst_tpu.metrics.inception import InceptionFeatures

                self.extractor = InceptionFeatures(weights, block_idx, batch_size)
            except Exception as e:  # pragma: no cover
                warnings.warn(f"could not load inception weights: {e}")
        if self.extractor is None:
            from rdst_tpu.losses.vgg import load_native_features
            from rdst_tpu.losses.vgg import _TAPS

            variables, width = load_native_features(_TAPS["54"])
            if variables is not None:
                self.extractor = _NativeVGGFeatures(variables, width,
                                                    batch_size)
        if self.extractor is None:
            if not _warned:
                warnings.warn(
                    "FID: inception weights unavailable; using random-projection "
                    "features (values not comparable to published FIDs)."
                )
                _warned = True
            self.extractor = _RandomProjectionFeatures()

    def _stats(self, imgs):
        act = self.extractor(list(imgs))
        mu = act.mean(axis=0)
        sigma = np.cov(act, rowvar=False)
        return mu, sigma

    def _fid(self, gts, preds) -> float:
        mu1, s1 = self._stats(gts)
        mu2, s2 = self._stats(preds)
        return frechet_distance(mu1, s1, mu2, s2)

    @staticmethod
    def _hwc(img) -> np.ndarray:
        img = np.asarray(img, np.float32)
        return img[:, :, None] if img.ndim == 2 else img

    def __call__(self, gts, preds) -> float:
        """Reference channel semantics (fid.py:169-195): RGB scores
        directly; any other channel count scores each channel alone
        (replicated to 3 for the extractor) and returns the mean of the
        per-channel FIDs — uniformly across extractors."""
        gts = [self._hwc(g) for g in gts]
        preds = [self._hwc(p) for p in preds]
        c = gts[0].shape[-1]
        if c == 3:
            return self._fid(gts, preds)
        vals = []
        for ch in range(c):
            g = [np.repeat(x[..., ch:ch + 1], 3, axis=-1) for x in gts]
            p = [np.repeat(x[..., ch:ch + 1], 3, axis=-1) for x in preds]
            vals.append(self._fid(g, p))
        return float(np.mean(vals))
