"""Independent test-side implementations of the sewar metric set.

sewar itself is not installable in this environment (and the reference's
metric path cannot run here), so these are SECOND implementations of the
published formulas (/root/reference/metrics/sr_metrics.py:36-45 imports
them from sewar.full_ref), written with different machinery than
rdst_tpu/metrics/image_metrics.py — explicit window sums via
scipy.signal convolutions and direct covariance algebra instead of
uniform_filter mean/variance identities — under the same documented
windowing conventions (ws=8 windows, int(round(ws/2)) edge crop,
channel averaging). Agreement between the two catches formula/algebra
errors; frozen goldens in test_metrics_golden.py catch regressions.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import convolve2d

EPS = np.finfo(np.float64).eps


def _f64(gt, p):
    return np.asarray(gt, np.float64), np.asarray(p, np.float64)


def _bands(x):
    return x[..., None] if x.ndim == 2 else x


def _per_band(fn, gt, p, *args):
    gt, p = _f64(gt, p)
    gt, p = _bands(gt), _bands(p)
    return float(np.mean([fn(gt[..., c], p[..., c], *args)
                          for c in range(gt.shape[-1])]))


def _win_sum(x, ws):
    """Window SUM at uniform_filter's (even-size) window placement —
    window for output pixel i spans [i - ws//2, i + ws - ws//2) — with
    scipy.ndimage's default 'reflect' boundary (numpy 'symmetric' pad),
    so the comparison isolates formula algebra from boundary policy."""
    lo = ws // 2
    hi = ws - 1 - lo
    xp = np.pad(x, ((lo, hi), (lo, hi)), mode="symmetric")
    return convolve2d(xp, np.ones((ws, ws)), mode="valid")


def mse(gt, p):
    gt, p = _f64(gt, p)
    d = (gt - p).ravel()
    return float(np.dot(d, d) / d.size)


def rmse(gt, p):
    return float(np.sqrt(mse(gt, p)))


def _rmse_sw_map(gt, p, ws):
    return np.sqrt(_win_sum((gt - p) ** 2, ws) / (ws * ws))


def rmse_sw(gt, p, ws=8):
    s = int(np.round(ws / 2))
    return _per_band(lambda a, b: np.mean(_rmse_sw_map(a, b, ws)[s:-s, s:-s]),
                     gt, p)


def _uqi_band(a, b, ws):
    n = ws * ws
    sa, sb = _win_sum(a, ws), _win_sum(b, ws)
    saa, sbb, sab = _win_sum(a * a, ws), _win_sum(b * b, ws), _win_sum(a * b, ws)
    mul = sa * sb
    sumsq = sa**2 + sb**2
    num = 4 * (n * sab - mul) * mul
    den1 = n * (saa + sbb) - sumsq
    den = den1 * sumsq
    q = np.ones_like(den)
    i0 = (den1 == 0) & (sumsq != 0)
    q[i0] = 2 * mul[i0] / sumsq[i0]
    inz = den != 0
    q[inz] = num[inz] / den[inz]
    s = (ws - 1) // 2
    return np.mean(q[s:q.shape[0] - s, s:q.shape[1] - s])


def uqi(gt, p, ws=8):
    return _per_band(lambda a, b: _uqi_band(a, b, ws), gt, p)


def ergas(gt, p, r=4, ws=8):
    gt, p = _f64(gt, p)
    gt, p = _bands(gt), _bands(p)
    n = ws * ws
    acc = 0.0
    for c in range(gt.shape[-1]):
        rm = _rmse_sw_map(gt[..., c], p[..., c], ws)
        means = _win_sum(gt[..., c], ws) / n
        bad = means == 0
        term = np.where(bad, 0.0, rm**2 / np.where(bad, 1.0, means) ** 2)
        acc = acc + term
    emap = 100 * r * np.sqrt(acc / gt.shape[-1])
    s = int(np.round(ws / 2))
    return float(np.mean(emap[s:-s, s:-s]))


def rase(gt, p, ws=8):
    gt, p = _f64(gt, p)
    gt, p = _bands(gt), _bands(p)
    n = ws * ws
    acc = 0.0
    for c in range(gt.shape[-1]):
        acc = acc + _rmse_sw_map(gt[..., c], p[..., c], ws) ** 2
    gmean = _win_sum(gt.mean(-1), ws) / n
    rmap = (100.0 / np.maximum(gmean, EPS)) * np.sqrt(acc / gt.shape[-1])
    s = int(np.round(ws / 2))
    return float(np.mean(rmap[s:-s, s:-s]))


def scc(gt, p, ws=8):
    lap = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float64)

    def band(a, b):
        ha = convolve2d(a, lap[::-1, ::-1], mode="same")  # correlation
        hb = convolve2d(b, lap[::-1, ::-1], mode="same")
        n = ws * ws
        va = _win_sum(ha * ha, ws) / n - (_win_sum(ha, ws) / n) ** 2
        vb = _win_sum(hb * hb, ws) / n - (_win_sum(hb, ws) / n) ** 2
        vab = _win_sum(ha * hb, ws) / n - (_win_sum(ha, ws) / n) * (_win_sum(hb, ws) / n)
        den = np.sqrt(np.maximum(va, 0)) * np.sqrt(np.maximum(vb, 0))
        return np.mean(np.where(den != 0, vab / np.maximum(den, EPS), 0.0))

    return _per_band(band, gt, p)


def sam(gt, p):
    gt, p = _f64(gt, p)
    gt, p = _bands(gt), _bands(p)
    dot = (gt * p).sum(-1)
    na, nb = np.linalg.norm(gt, axis=-1), np.linalg.norm(p, axis=-1)
    prod = na * nb
    valid = prod > 0
    ang = np.arccos(np.clip(dot / np.maximum(prod, EPS), -1, 1))
    return float(ang[valid].mean()) if valid.any() else 0.0


def psnrb(gt, p, data_range=1.0):
    def bef(im, bs=8):
        h, w = im.shape
        db = dbc = 0.0
        nb = nbc = 0
        for axis, size in ((1, w), (0, h)):
            d = np.diff(im, axis=axis) ** 2
            boundary = (np.arange(size - 1) % bs) == bs - 1
            sl = (slice(None), boundary) if axis == 1 else (boundary, slice(None))
            slc = (slice(None), ~boundary) if axis == 1 else (~boundary, slice(None))
            db += d[sl].sum()
            dbc += d[slc].sum()
            nb += boundary.sum() * (h if axis == 1 else w)
            nbc += (~boundary).sum() * (h if axis == 1 else w)
        db /= max(nb, 1)
        dbc /= max(nbc, 1)
        t = np.log2(bs) / np.log2(min(h, w)) if db > dbc else 0.0
        return t * (db - dbc)

    def band(a, b):
        m = np.mean((a - b) ** 2) + bef(b)
        return np.inf if m == 0 else 10 * np.log10(data_range**2 / m)

    return _per_band(band, gt, p)
