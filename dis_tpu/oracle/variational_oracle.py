"""Independent NumPy oracle for the variational refinement step.

The reference skips refinement entirely (``/root/reference/README.md:11``),
so the DIS paper (Kroeger et al., ECCV 2016, sec. 3.3 — Brox-style
energy) is the spec.  This module gives two independent checks for
``dis_tpu.ops.variational``:

- :func:`energy` — the TRUE (non-linearized) warped Charbonnier energy

      E(U) = sum  delta * Psi(|I2(x+U) - I1(x)|^2)
                + gamma * Psi(|grad I2(x+U) - grad I1(x)|^2)
                + alpha * Psi(|grad u|^2 + |grad v|^2)

  with Psi(s^2) = sqrt(s^2 + eps^2), evaluated with the same
  discretization choices as the pipeline (Sobel gradients, bilinear
  edge-clamped warp, forward-difference flow gradients with replicate
  border, out-of-bounds data terms masked).  IRLS outer iterations must
  not increase it on well-posed problems.

- :func:`el_residual` — the Euler-Lagrange residual of the
  warp-LINEARIZED energy that one outer iteration minimizes, assembled
  here directly from the energy's stationarity conditions (derived
  independently of the JAX implementation's A11/A12/A22/b factoring).
  The fixed point of the inner red-black sweeps must satisfy it.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import DISConfig
from .reference_semantics import sobel3
# Per-term Charbonnier epsilons are part of the spec (see the rationale
# in ops/variational.py); import so oracle and pipeline cannot drift.
from ..ops.variational import _EPS2_DATA, _EPS2_SMOOTH


def _psi(s2: np.ndarray, eps2: float) -> np.ndarray:
    return np.sqrt(s2 + eps2)


def _psi_deriv(s2: np.ndarray, eps2: float) -> np.ndarray:
    return 0.5 / np.sqrt(s2 + eps2)


def _shift_edge(x: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Neighbor value at (y+dy, x+dx) with replicate border."""
    h, w = x.shape
    xp = np.pad(x, 1, mode="edge")
    return xp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def warp_planes(planes: np.ndarray, flow: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear sample of stacked [H, W, C] planes at ``x + flow`` with
    edge clamping; returns (warped, in_bounds)."""
    h, w, c = planes.shape
    ys, xs = np.mgrid[0:h, 0:w]
    fx = xs + flow[..., 0]
    fy = ys + flow[..., 1]
    inb = (fx >= 0) & (fx <= w - 1) & (fy >= 0) & (fy <= h - 1)
    fxc = np.clip(fx, 0.0, w - 1.0)
    fyc = np.clip(fy, 0.0, h - 1.0)
    x0 = np.floor(fxc).astype(np.int64)
    y0 = np.floor(fyc).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    a = (fxc - x0)[..., None]
    b = (fyc - y0)[..., None]
    out = ((1 - a) * (1 - b) * planes[y0, x0] + a * (1 - b) * planes[y0, x1]
           + (1 - a) * b * planes[y1, x0] + a * b * planes[y1, x1])
    return out, inb


def _grad_planes(I1: np.ndarray, I2: np.ndarray):
    I2x = sobel3(I2, "x")
    I2y = sobel3(I2, "y")
    I1x = sobel3(I1, "x")
    I1y = sobel3(I1, "y")
    I2xx = sobel3(I2x, "x")
    I2xy = sobel3(I2x, "y")
    I2yy = sobel3(I2y, "y")
    return I1x, I1y, I2x, I2y, I2xx, I2xy, I2yy


def energy(I1: np.ndarray, I2: np.ndarray, flow: np.ndarray,
           cfg: DISConfig) -> float:
    """True warped Charbonnier energy of ``flow`` (paper eq., sec 3.3)."""
    I1x, I1y, I2x, I2y, _, _, _ = _grad_planes(I1, I2)
    planes = np.stack([I2, I2x, I2y], axis=-1)
    warped, inb = warp_planes(planes, flow)
    m = inb.astype(np.float64)
    W, Wx, Wy = warped[..., 0], warped[..., 1], warped[..., 2]

    data = cfg.refinement_delta * _psi((W - I1) ** 2, _EPS2_DATA) * m
    grad = cfg.refinement_gamma * _psi((Wx - I1x) ** 2 + (Wy - I1y) ** 2,
                                      _EPS2_DATA) * m

    U = flow[..., 0].astype(np.float64)
    V = flow[..., 1].astype(np.float64)
    Ux = _shift_edge(U, 0, 1) - U
    Uy = _shift_edge(U, 1, 0) - U
    Vx = _shift_edge(V, 0, 1) - V
    Vy = _shift_edge(V, 1, 0) - V
    smooth = cfg.refinement_alpha * _psi(
        Ux * Ux + Uy * Uy + Vx * Vx + Vy * Vy, _EPS2_SMOOTH)
    return float((data + grad).sum() + smooth.sum())


def el_residual(I1: np.ndarray, I2: np.ndarray, flow0: np.ndarray,
                du: np.ndarray, dv: np.ndarray, cfg: DISConfig
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Euler-Lagrange residual of the warp-linearized energy at (du, dv).

    Stationarity of

        E_lin = sum delta*Psi(r_d^2) + gamma*Psi(r_gx^2 + r_gy^2)
                  + alpha*Psi(|grad(U0+du)|^2 + |grad(V0+dv)|^2)

    with r_d = Iz + Wx du + Wy dv etc. (planes warped at ``flow0``)
    gives, per pixel p,

        0 = wd Wx r_d + wg (Wxx r_gx + Wxy r_gy)
            + sum_{q in N4(p)} w_pq ((U_p) - (U_q))        [u-component]

    where wd = delta Psi'(r_d^2) (masked OOB), wg analogous, and
    w_pq = (ws_p + ws_q)/2 with ws = alpha Psi'(|grad U|^2 + |grad V|^2)
    (the standard averaged-diffusivity edge discretization; replicate
    border makes boundary edge terms vanish).  Returns the (u, v)
    residual fields — ~0 at the inner-iteration fixed point.
    """
    u0 = flow0[..., 0].astype(np.float64)
    v0 = flow0[..., 1].astype(np.float64)
    du = du.astype(np.float64)
    dv = dv.astype(np.float64)
    I1x, I1y, I2x, I2y, I2xx, I2xy, I2yy = _grad_planes(I1, I2)
    planes = np.stack([I2, I2x, I2y, I2xx, I2xy, I2yy], axis=-1)
    warped, inb = warp_planes(planes, flow0)
    m = inb.astype(np.float64)
    W, Wx, Wy, Wxx, Wxy, Wyy = [warped[..., i] for i in range(6)]

    Iz = W - I1
    Izx = Wx - I1x
    Izy = Wy - I1y

    r_d = Iz + Wx * du + Wy * dv
    wd = cfg.refinement_delta * _psi_deriv(r_d ** 2, _EPS2_DATA) * m
    r_gx = Izx + Wxx * du + Wxy * dv
    r_gy = Izy + Wxy * du + Wyy * dv
    wg = cfg.refinement_gamma * _psi_deriv(r_gx ** 2 + r_gy ** 2,
                                           _EPS2_DATA) * m

    U = u0 + du
    V = v0 + dv
    Ux = _shift_edge(U, 0, 1) - U
    Uy = _shift_edge(U, 1, 0) - U
    Vx = _shift_edge(V, 0, 1) - V
    Vy = _shift_edge(V, 1, 0) - V
    ws = cfg.refinement_alpha * _psi_deriv(
        Ux ** 2 + Uy ** 2 + Vx ** 2 + Vy ** 2, _EPS2_SMOOTH)

    res_u = wd * Wx * r_d + wg * (Wxx * r_gx + Wxy * r_gy)
    res_v = wd * Wy * r_d + wg * (Wxy * r_gx + Wyy * r_gy)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        w_pq = 0.5 * (ws + _shift_edge(ws, dy, dx))
        res_u = res_u + w_pq * (U - _shift_edge(U, dy, dx))
        res_v = res_v + w_pq * (V - _shift_edge(V, dy, dx))
    return res_u, res_v
