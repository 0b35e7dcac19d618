"""Literal numpy transcription of the reference's forward math.

This is the GOLDEN ORACLE for numeric parity tests: every formula below is
a line-by-line transcription of the reference's Numba-CUDA kernels and
torch model (citations inline), evaluated densely in float64 over all
pairs. The hash-grid traversal in the reference only ever *adds pairs
beyond the kernel radius*, where every kernel is exactly zero, so a dense
all-pairs sum reproduces the grid result up to summation order.

It deliberately imports NOTHING from sph_nca_tpu — the framework under
test must match this file, not the other way around.

Reference sources:
  /root/reference/code/sphops/ops/kernels_impl.py   (kernel functions)
  /root/reference/code/sphops/ops/operators_batch.py (op loops)
  /root/reference/code/nca.py                        (SPHNCA.forward)
"""

from __future__ import annotations

import numpy as np


# --- SPH kernels (kernels_impl.py) -----------------------------------------


def poly6_normalization(dim: int, h: float) -> float:
    # kernels_impl.py:20-30 smoothing_poly6_normalization_nd
    if dim == 2:
        return 4.0 / (np.pi * h**8)
    if dim == 3:
        return 315.0 / (64.0 * np.pi * h**9)
    raise NotImplementedError(dim)


def poly6(r: np.ndarray, h: float) -> np.ndarray:
    """W(r) = max((h^2 - |r|^2)^3, 0)  (kernels_impl.py:32-40)."""
    d2 = np.sum(r * r, axis=-1)
    return np.maximum((h**2 - d2) ** 3, 0.0)


def spiky_normalization(dim: int, h: float) -> float:
    # kernels_impl.py:131-141 gradient_spiky_normalization_nd
    if dim == 2:
        return 10.0 / (np.pi * h**5)
    if dim == 3:
        return 15.0 / (np.pi * h**6)
    raise NotImplementedError(dim)


def spiky_grad(r: np.ndarray, h: float) -> np.ndarray:
    """out[d] = r[d] and mag * r[d], mag = (h-d>0) * 3 (h-d)^2 / d
    (kernels_impl.py:143-156 gradient_spiky_nd)."""
    d2 = np.sum(r * r, axis=-1)
    d = np.sqrt(d2)
    with np.errstate(divide="ignore", invalid="ignore"):
        mag = np.where(h - d > 0, 3.0 * (h - d) ** 2 / d, 0.0)
    mag = np.where(d > 0, mag, 0.0)  # self-pair: r[i]==0 -> 0 per component
    out = mag[..., None] * r
    return np.where(r == 0.0, 0.0, out)


# --- sphops operators (operators_batch.py), dense all-pairs form ------------


def _disp(x: np.ndarray, period=None) -> np.ndarray:
    """All-pairs displacement r_ij = x_j - x_i, minimum-image when the
    domain is periodic (the reference's wrapped texture plane: the hash
    grid wraps modulo the domain and sample_plane keeps positions in
    [-1, 1], so each pair sees its nearest periodic image)."""
    r = x[None, :, :] - x[:, None, :]
    if period is not None:
        p = np.asarray(period, np.float64)
        r = r - np.round(r / p) * p
    return r


def volume(x: np.ndarray, h: float, period=None) -> np.ndarray:
    """v_i = 1 / (norm * sum_j W(x_j - x_i))
    (operators_batch.py:17-77 volume_forward_nd; self-pair included)."""
    w = poly6(_disp(x, period), h).sum(axis=1)
    return 1.0 / (poly6_normalization(x.shape[1], h) * w)


def gradient(x: np.ndarray, v: np.ndarray, A: np.ndarray, h: float,
             period=None) -> np.ndarray:
    """GA_i[f,d] = norm * sum_j v_j (A_j[f] - A_i[f]) gradW(x_j - x_i)[d]
    (operators_batch.py:159-236 gradient_forward_nd; the v_j factor enters
    through gradient_kernel(r, h, grad_w, vj))."""
    r = _disp(x, period)  # [i, j, d]
    gw = spiky_grad(r, h) * v[None, :, None]  # [i, j, d]
    dA = A[None, :, :] - A[:, None, :]  # [i, j, f]
    GA = np.einsum("ijf,ijd->ifd", dA, gw)
    return spiky_normalization(x.shape[1], h) * GA


def blur(x: np.ndarray, v: np.ndarray, F: np.ndarray, h: float,
         period=None) -> np.ndarray:
    """SA_i[f] = norm * sum_j W(x_j - x_i) v_j F_j[f]
    (operators_batch.py:601-665 blur_forward_nd)."""
    w = poly6(_disp(x, period), h) * v[None, :]  # [i, j]
    return poly6_normalization(x.shape[1], h) * (w @ F)


# --- SPHNCA forward (nca.py) -------------------------------------------------


def cell_activity(A: np.ndarray, use_alpha: bool = True) -> np.ndarray:
    # nca.py:17-21
    return A[..., 3] if use_alpha else np.ones_like(A[..., 3])


def life_mask(x, v, activity, h, period=None):
    """blur((activity > 0.1).float) > 0.1  (nca.py:71-79)."""
    m = (activity > 0.1).astype(np.float64)[:, None]
    sm = blur(x, v, m, h, period)
    return sm[:, 0] > 0.1


def mlp(y: np.ndarray, w0, b0, w1, b1) -> np.ndarray:
    """Linear-ReLU-Linear, torch Linear convention y @ W.T + b
    (nca.py:50-54)."""
    hdn = np.maximum(y @ w0.T + b0, 0.0)
    return hdn @ w1.T + b1


def forward(
    x: np.ndarray,
    v: np.ndarray,
    A: np.ndarray,
    h: float,
    weights,  # (w0, b0, w1, b1)
    *,
    update_rule: str = "gated",
    fire_rate: float = 1.0,
    use_alpha: bool = True,
    normalize_perception: float = -1.0,
    update_mask: np.ndarray | None = None,
    period=None,
):
    """One SPHNCA step (nca.py:87-115 SPHNCA.forward), returning the new
    state plus every intermediate for granular parity checks.

    fire_rate=1.0 (or an explicit update_mask) makes the step
    deterministic — the only stochastic element is torch.rand(x.shape[0])
    <= fire_rate (nca.py:101).
    """
    w0, b0, w1, b1 = weights
    c = A.shape[1]

    activity = cell_activity(A, use_alpha)
    prev_mask = life_mask(x, v, activity, h, period)  # nca.py:88-89

    gA = gradient(x, v, A, h, period)  # nca.py:65-66 perceive
    if normalize_perception > 0:  # nca.py:67-68
        gA = h * gA * normalize_perception
    # default_feature_processs (nca.py:23-31): concat A, gA_x, gA_y
    y = np.concatenate([A, gA[..., 0], gA[..., 1]], axis=-1)

    dA = mlp(y, w0, b0, w1, b1)  # nca.py:98

    if update_mask is None:
        update_mask = np.ones(x.shape[0], dtype=bool)  # fire_rate == 1

    if update_rule == "gated":  # nca.py:103-107
        gate = 1.0 / (1.0 + np.exp(-dA[..., :c]))
        delta = np.tanh(dA[..., c:-1])
        mult = 1.0 / (1.0 + np.exp(-dA[..., -1:]))
        nA = A * gate + delta * mult
    elif update_rule == "orig":  # nca.py:108-109
        nA = A + dA * 1.0  # self.fire_rate / fire_rate with both equal
    else:
        raise ValueError(update_rule)

    nA = np.where(update_mask[:, None], nA, A)  # nca.py:111

    new_mask = life_mask(x, v, cell_activity(nA, use_alpha), h, period)  # nca.py:113
    living = prev_mask & new_mask  # nca.py:114-115
    nA = nA * living[:, None].astype(nA.dtype)

    return {
        "v": v,
        "prev_mask": prev_mask,
        "gA": gA,
        "y": y,
        "dA": dA,
        "new_mask": new_mask,
        "nA": nA,
    }
