"""Batched inverse-compositional Lucas-Kanade patch search (pure JAX).

The reference runs one mutable state machine per patch, sequentially
(patch.cpp:119-203, dispatched from patch_grid.cpp:99-106).  Here the
whole grid is a struct-of-arrays batch and every iteration runs all
patches at once; frozen patches are masked, which preserves the
reference's per-patch semantics exactly (a frozen patch's ``u`` never
changes again, and its query resample has no observable effect).

Quirk-compat details (SURVEY.md §2):
- Q3: ``delta_u = H^-1 [sum(Tdx*Q); sum(Tdy*Q)]`` — the template is NOT
  subtracted in compat mode (patch.cpp:171-176).  Fixed mode uses the
  true residual ``Q - T`` (with the template mean-normalized when
  patch_normalization is on).
- Q5: no convergence test in compat mode; the loop body runs exactly
  ``iterations + 1`` times unless policing freezes a patch
  (counter semantics of patch.cpp:141,167,199).
- Q9: policing resets ``u`` to the scale's init and freezes the patch
  when it moves more than ``patch_size/2`` from its start position or
  leaves the valid region (patch.cpp:185-194).
- Q10: bilinear sampling addresses taps from ``ceil(pos + 1e-5)``
  computed in float32 (patch.cpp:222-234), reproduced bit-for-bit
  including the float32 rounding of the +1e-5 nudge.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DISConfig

# Template extraction route (all bit-exact; end-to-end v5e framex,
# 1080p DIS-fast): "twostage_rw" 16.38 ms — separable decimation with
# reduce_window column passes, the TPU auto default; "slices" (3*ps^2
# lane-strided slices) 19.58 ms — the CPU auto default; "twostage"
# 18.79 ms; "conv" (one MXU patches-conv, HIGHEST precision) loses at
# the finest scale (5.64 vs 1.53 ms isolated) and is opt-in under
# DIS_TPU_TEMPLATES_CONV_MAX (default 0 = never); "stacked3"/"rw" are
# recorded dead ends kept switchable.
_TEMPLATES = _os.environ.get("DIS_TPU_TEMPLATES", "auto")
_CONV_MAX_PATCHES = int(_os.environ.get("DIS_TPU_TEMPLATES_CONV_MAX", "0"))


class PatchTemplates(NamedTuple):
    T: jnp.ndarray      # [N, ps*ps] raw template values
    Tdx: jnp.ndarray    # [N, ps*ps] template d/dx
    Tdy: jnp.ndarray    # [N, ps*ps] template d/dy
    Hinv: jnp.ndarray   # [N, 2, 2] inverse 2x2 Hessian


# A/B toggle for the round-4 bitwise-stability work (forced-association
# reductions).  "1" (default): pairwise trees behind optimization
# barriers — batched == serial bitwise.  "0": plain jnp.sum /
# compiler-chosen association — the pre-round-4 numerics, kept ONLY so
# the barrier cost can be measured on chip (tools/trace_budget.py,
# PERF_NOTES round-5 ledger).  Not a supported operating point: batched
# pairs may drift 1 ulp from serial with it off.
_BITWISE_SUMS = _os.environ.get("DIS_TPU_BITWISE_SUMS", "1") != "0"


def pairwise_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the last axis with a FORCED pairwise association tree.

    ``jnp.sum`` leaves the association to the compiler AND the program
    context: the identical Hessian reduction compiled 1 ulp different
    under ``jax.vmap`` (batched pairs) than serial on chip, which the
    search's discrete policing then amplified into real flow diffs
    (round 4).  Two-element reductions have no association freedom, so
    a log2 chain of trailing-pair reductions is bit-stable in every
    program context — this is what makes batched == serial bitwise.
    Odd lengths are zero-padded (x + 0.0 == x in f32 for every x except
    -0.0 -> +0.0, which compares equal and adds identically).

    The entry barrier is load-bearing too: the summand is typically a
    product (Tdx*Tdx, residual^2), and XLA fuses producer multiplies
    into the first add level as FMAs — picking different operands in
    different contexts (confirmed on chip: Hinv still differed batched
    vs serial with the tree alone).  Materializing the summand forces
    plain adds everywhere.
    """
    if not _BITWISE_SUMS:
        return jnp.sum(x, axis=-1)
    x = lax.optimization_barrier(x)
    while x.shape[-1] > 1:
        k = x.shape[-1]
        if k % 2:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
            k += 1
        x = x.reshape(x.shape[:-1] + (k // 2, 2))
        # explicit binary add, NOT .sum(-1): a chain of trailing-pair
        # REDUCE ops is re-foldable into one reduce whose order is
        # implementation-defined again (observed on chip: the tree
        # alone changed nothing); an add's float semantics are fixed.
        x = x[..., 0] + x[..., 1]
    return x[..., 0]


def _tap_tree(vals):
    """Association-forced pair tree over a tap LIST: pure elementwise
    adds on per-tap planes — no stacks, no relayouts.  Pairing
    (0,1)(2,3)... per level matches :func:`pairwise_sum`, so the float
    adds — and results — are identical to the [N, ps*ps] tree bitwise.
    The barrier stops XLA from fusing the producer products into
    first-level FMAs (operand choice is context-dependent; chip
    round 4)."""
    if not _BITWISE_SUMS:
        return sum(vals[1:], vals[0])
    vals = list(lax.optimization_barrier(tuple(vals)))
    while len(vals) > 1:
        if len(vals) % 2:
            vals.append(jnp.zeros_like(vals[0]))
        vals = [vals[i] + vals[i + 1] for i in range(0, len(vals), 2)]
    return vals[0]


def extract_templates(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                      centers: jnp.ndarray, ps: int, pad: int) -> PatchTemplates:
    """Template extraction at rounded centers + Hessian (patch.cpp:47-91).

    ``img``/``dx``/``dy`` are the padded level planes; ``centers`` [N, 2]
    are integer-valued patch centers in unpadded coords.
    """
    tmp_h, tmp_w = img.shape
    half = ps // 2
    offs = jnp.arange(-half, half)  # lb..ub inclusive
    px = jnp.round(centers[:, 0]).astype(jnp.int32) + pad
    py = jnp.round(centers[:, 1]).astype(jnp.int32) + pad
    rows = py[:, None, None] + offs[None, :, None]
    cols = px[:, None, None] + offs[None, None, :]
    idx = (rows * tmp_w + cols).reshape(centers.shape[0], ps * ps)
    T = jnp.take(img.ravel(), idx, axis=0)
    Tdx = jnp.take(dx.ravel(), idx, axis=0)
    Tdy = jnp.take(dy.ravel(), idx, axis=0)

    a = pairwise_sum(Tdx * Tdx)
    b = pairwise_sum(Tdx * Tdy)
    c = pairwise_sum(Tdy * Tdy)
    det = a * c - b * b
    guard = jnp.where(det == 0, jnp.float32(1e-10), jnp.float32(0.0))
    a = a + guard
    c = c + guard
    det = a * c - b * b
    inv_det = 1.0 / det
    Hinv = jnp.stack(
        [jnp.stack([c * inv_det, -b * inv_det], -1),
         jnp.stack([-b * inv_det, a * inv_det], -1)], -2)
    return PatchTemplates(T=T, Tdx=Tdx, Tdy=Tdy, Hinv=Hinv)


def extract_templates_grid(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                           geom, ps: int, pad: int,
                           row0: int = 0) -> PatchTemplates:
    """Template extraction for a regular patch grid — gather-free.

    Patch centers sit on a regular ``steps``-strided lattice
    (patch_grid.cpp:43-44), so each of the ps*ps template taps is a
    strided slice of the level plane: 3 * ps^2 strided slices replace
    the 3 * N * ps^2-element gather (measured ~20x faster on TPU).
    Produces patches in the reference's x-outer/y-inner order.
    """
    s = geom.steps
    half = ps // 2
    n = geom.num_w * geom.num_h
    # first included patch row, in local-plane coords (row0 = global
    # unpadded row of the stripe start; 0 when untiled)
    y0 = geom.iy0 * s + geom.offset_h - half + pad - row0
    x0 = geom.offset_w - half + pad

    mode = _TEMPLATES
    if mode == "auto":
        # Measured end-to-end on v5e (framex, 1080p DIS-fast compat):
        # slices 19.58 ms, twostage 18.79, twostage_rw 16.38 — the
        # separable reduce_window column decimation replaces the 4.6 ms
        # (17.1 ms at 4K) of lane-strided slice ops.  CPU keeps slices
        # (reduce_window decimation is ~2x slower there).  The conv
        # route stays opt-in under DIS_TPU_TEMPLATES_CONV_MAX.
        # "twostage_rw_t" (round-5 RECORDED NEGATIVE): the same
        # decimation on transposed planes, so taps come out [nw, nh]
        # and the x-outer flatten is a free major-dim merge instead of
        # the nh<->nw relayout of the tap tensor (2.1 ms at 4K).
        # Bitwise identical, but measured WORSE end-to-end (device-op
        # total 13.20 vs 11.44 ms at 1080p, 56.9 vs 50.7 at 4K): the
        # upfront plane transposes and the decimation over the
        # transposed (tall-sublane) layout cost more than the relayout
        # they remove.  Kept switchable.
        if jax.default_backend() == "cpu":
            mode = "slices"
        elif n <= _CONV_MAX_PATCHES:
            mode = "conv"
        else:
            mode = "twostage_rw"

    if mode in ("twostage", "twostage_rw"):
        # Separable decimation: 8 row-decimating slices (sublane stride
        # s, contiguous rows -> cheap DMA) then 64 column-decimating
        # passes on the 5x-smaller compacts, instead of 192 (s,s)-strided
        # plane slices that each re-touch ~1.7 MB of plane rows.  The
        # column pass is a lane-strided slice ("twostage") or a
        # window-1 stride-s reduce_window ("twostage_rw") — the same
        # mechanism that beat strided slices 220x in resize_half; the
        # lane-strided slice was the pathology all along.
        p3 = jnp.stack([img, dx, dy])                   # [3, Hp, Wp]
        xe = x0 + (geom.num_w - 1) * s + ps
        rows = []
        for j in range(ps):
            yc = lax.slice(p3, (0, y0 + j, x0),
                           (3, y0 + j + (geom.num_h - 1) * s + 1, xe),
                           (1, s, 1))                   # [3, nh, xe-x0]
            rows.append(yc)
        taps = []
        for j in range(ps):
            for i in range(ps):
                if mode == "twostage_rw":
                    win = lax.slice(
                        rows[j], (0, 0, i),
                        (3, geom.num_h, i + (geom.num_w - 1) * s + 1))
                    taps.append(lax.reduce_window(
                        win, jnp.float32(0), lax.add,
                        (1, 1, 1), (1, 1, s), "VALID"))  # [3, nh, nw]
                else:
                    taps.append(lax.slice(
                        rows[j], (0, 0, i),
                        (3, geom.num_h, i + (geom.num_w - 1) * s + 1),
                        (1, 1, s)))                     # [3, nh, nw]
        # Hessian sums via _tap_tree: pure elementwise adds on [nh, nw]
        # planes — no stacks, no relayouts (pairwise_sum's
        # trailing-dim-2 slices tile a 2-wide minor dim and cost
        # ~1 ms/frame at 1080p; a tap-major stack + transpose costs
        # ~0.5 ms).
        dxs = [t[1] for t in taps]
        dys = [t[2] for t in taps]
        abc = [_tap_tree([x * x for x in dxs]),
               _tap_tree([x * y for x, y in zip(dxs, dys)]),
               _tap_tree([y * y for y in dys])]
        # [nh, nw] -> x-outer flat order (transpose to [nw, nh])
        a, b, c = (v.T.reshape(n) for v in abc)
        st = jnp.stack(taps, axis=-1)                   # [3, nh, nw, 64]
        st = st.transpose(0, 2, 1, 3).reshape(3, n, ps * ps)
        return _templates_from_hessian(st[0], st[1], st[2], a, b, c)

    if mode == "twostage_rw_t":
        # Transposed twostage_rw: decimate on TRANSPOSED planes so taps
        # land [3, nw, nh] and the reference's x-outer patch order is a
        # free major-dim ravel.  Identical tap values and identical
        # per-patch Hessian association as twostage_rw (the window-1
        # reduce_window is pure decimation, no arithmetic), verified
        # bitwise in tests/test_pipeline_parity.py.
        p3t = jnp.stack([img.T, dx.T, dy.T])            # [3, Wp, Hp]
        ye = y0 + (geom.num_h - 1) * s + ps
        cols = []
        for i in range(ps):
            xc = lax.slice(p3t, (0, x0 + i, y0),
                           (3, x0 + i + (geom.num_w - 1) * s + 1, ye),
                           (1, s, 1))                   # [3, nw, ye-y0]
            cols.append(xc)
        taps = []
        for j in range(ps):
            for i in range(ps):
                win = lax.slice(
                    cols[i], (0, 0, j),
                    (3, geom.num_w, j + (geom.num_h - 1) * s + 1))
                taps.append(lax.reduce_window(
                    win, jnp.float32(0), lax.add,
                    (1, 1, 1), (1, 1, s), "VALID"))     # [3, nw, nh]

        dxs = [t[1] for t in taps]
        dys = [t[2] for t in taps]
        abc = [_tap_tree([x * x for x in dxs]),
               _tap_tree([x * y for x, y in zip(dxs, dys)]),
               _tap_tree([y * y for y in dys])]
        a, b, c = (v.reshape(n) for v in abc)           # x-outer already
        st = jnp.stack(taps, axis=-1)                   # [3, nw, nh, 64]
        st = st.reshape(3, n, ps * ps)
        return _templates_from_hessian(st[0], st[1], st[2], a, b, c)

    if mode in ("stacked3", "rw"):
        # One [3, nh, nw] strided slice (or reduce_window decimation)
        # per tap instead of three: same copies, one third the op count
        # (the 3 * ps^2 slices bill ~4.6 ms/frame in the device trace).
        ye = y0 + (geom.num_h - 1) * s + 1
        xe = x0 + (geom.num_w - 1) * s + 1
        p3 = jnp.stack([img, dx, dy])                   # [3, Hp, Wp]
        taps = []
        for j in range(ps):
            for i in range(ps):
                if mode == "rw":
                    win = lax.slice(p3, (0, y0 + j, x0 + i),
                                    (3, ye + j, xe + i))
                    t = lax.reduce_window(win, jnp.float32(0), lax.add,
                                          (1, 1, 1), (1, s, s), "VALID")
                else:
                    t = lax.slice(p3, (0, y0 + j, x0 + i),
                                  (3, ye + j, xe + i), (1, s, s))
                taps.append(t)                          # [3, nh, nw]
        st = jnp.stack(taps, axis=-1)                   # [3, nh, nw, 64]
        st = st.transpose(0, 2, 1, 3).reshape(3, n, ps * ps)
        return _templates_from_taps(st[0], st[1], st[2])

    if mode == "conv":
        # One MXU patches-conv for all three planes replaces 3*ps^2
        # strided slices (the round-2 device trace bills those at
        # ~4.6 ms/frame across the four scales).  The one-hot identity
        # filter at HIGHEST precision copies taps exactly (each output
        # is one 1.0*x product plus zeros under the bf16x3 f32
        # decomposition) — bit-identical to the slice path
        # (tests/test_pipeline_parity.py::test_templates_conv_matches_slices).
        ye = y0 + (geom.num_h - 1) * s + ps
        xe = x0 + (geom.num_w - 1) * s + ps
        p3 = jnp.stack([img[y0:ye, x0:xe], dx[y0:ye, x0:xe],
                        dy[y0:ye, x0:xe]])[None]          # [1, 3, Hw, Ww]
        pat = lax.conv_general_dilated_patches(
            p3, (ps, ps), (s, s), "VALID",
            precision=lax.Precision.HIGHEST)[0]           # [3*ps^2, nh, nw]
        # channel order is plane-major then (j, i) — verified vs slices
        flat = pat.transpose(2, 1, 0).reshape(n, 3 * ps * ps)  # x-outer
        T = flat[:, :ps * ps]
        Tdx = flat[:, ps * ps:2 * ps * ps]
        Tdy = flat[:, 2 * ps * ps:]
        return _templates_from_taps(T, Tdx, Tdy)

    def tap_stack(plane):
        cols = []
        for j in range(ps):
            for i in range(ps):
                sl = lax.slice(
                    plane,
                    (y0 + j, x0 + i),
                    (y0 + j + (geom.num_h - 1) * s + 1,
                     x0 + i + (geom.num_w - 1) * s + 1),
                    (s, s))          # [num_h, num_w]
                cols.append(sl)
        st = jnp.stack(cols, axis=-1)            # [num_h, num_w, ps*ps]
        return st.transpose(1, 0, 2).reshape(n, ps * ps)  # x-outer order

    T = tap_stack(img)
    Tdx = tap_stack(dx)
    Tdy = tap_stack(dy)
    return _templates_from_taps(T, Tdx, Tdy)


def _templates_from_taps(T: jnp.ndarray, Tdx: jnp.ndarray,
                         Tdy: jnp.ndarray) -> PatchTemplates:
    """2x2 Gauss-Newton Hessian + det==0 guard (patch.cpp:75-91)."""
    a = pairwise_sum(Tdx * Tdx)
    b = pairwise_sum(Tdx * Tdy)
    c = pairwise_sum(Tdy * Tdy)
    return _templates_from_hessian(T, Tdx, Tdy, a, b, c)


def _templates_from_hessian(T, Tdx, Tdy, a, b, c) -> PatchTemplates:
    """Assemble PatchTemplates from precomputed Hessian sums (the TPU
    template route computes them in tap-major layout; same association
    tree as pairwise_sum, so both spellings agree bitwise)."""
    det = a * c - b * b
    guard = jnp.where(det == 0, jnp.float32(1e-10), jnp.float32(0.0))
    a = a + guard
    c = c + guard
    det = a * c - b * b
    inv_det = 1.0 / det
    Hinv = jnp.stack(
        [jnp.stack([c * inv_det, -b * inv_det], -1),
         jnp.stack([-b * inv_det, a * inv_det], -1)], -2)
    return PatchTemplates(T=T, Tdx=Tdx, Tdy=Tdy, Hinv=Hinv)


def sample_patches(img2: jnp.ndarray, pos: jnp.ndarray, ps: int, pad: int,
                   normalize: bool, row0: int = 0) -> jnp.ndarray:
    """Bilinear warped query patches [N, ps*ps] (patch.cpp:207-267).

    One gathered (ps+1)x(ps+1) window per patch, combined as four
    shifted taps with the reference's exact weight/tap pairing; tap base
    is ``ceil(pos + 1e-5)`` in float32 (Q10).  Out-of-range positions
    (possible only for masked/frozen patches) are index-clipped.
    """
    tmp_h, tmp_w = img2.shape
    n = pos.shape[0]
    half = ps // 2
    posx = pos[:, 0].astype(jnp.float32)
    posy = pos[:, 1].astype(jnp.float32)
    l = jnp.floor(posx)
    k = jnp.floor(posy)
    a = posx - l
    b = posy - k
    w0 = (1 - a) * (1 - b)
    w1 = a * (1 - b)
    w2 = b * (1 - a)
    w3 = a * b

    # float32 ceil(pos + 1e-5); clip before int cast to keep the cast
    # defined for wildly out-of-range (frozen-patch) positions.
    nudge = jnp.float32(1e-5)
    cpx = jnp.clip(jnp.ceil(posx + nudge), -1e6, 1e6).astype(jnp.int32) + pad
    cpy = (jnp.clip(jnp.ceil(posy + nudge), -1e6, 1e6).astype(jnp.int32)
           + pad - row0)

    doff = jnp.arange(ps + 1)
    rows = jnp.clip((cpy - half - 1)[:, None, None] + doff[None, :, None], 0, tmp_h - 1)
    cols = jnp.clip((cpx - half - 1)[:, None, None] + doff[None, None, :], 0, tmp_w - 1)
    idx = (rows * tmp_w + cols).reshape(n, (ps + 1) * (ps + 1))
    W = jnp.take(img2.ravel(), idx, axis=0).reshape(n, ps + 1, ps + 1)

    q = (w3[:, None, None] * W[:, 1:, 1:]
         + w2[:, None, None] * W[:, 1:, :-1]
         + w1[:, None, None] * W[:, :-1, 1:]
         + w0[:, None, None] * W[:, :-1, :-1]).reshape(n, ps * ps)
    if normalize:
        q = q - q.sum(axis=1, keepdims=True) * jnp.float32(1.0 / (ps * ps))
    return q


# Matmul precision for the XLA-fallback contractions (the region
# sampler's one-hot bilinear einsum and the Hinv matvec).  "highest" is
# the only correct setting on TPU — the default precision lowers these
# f32 contractions to one truncating bf16 pass (CPU ignores precision,
# so CPU tests cannot catch it).  "default" exists ONLY so
# tools/chip_precision_check.py can demonstrate the footgun on chip.
_prec_env = _os.environ.get("DIS_TPU_XLA_PRECISION", "highest").lower()
if _prec_env not in ("highest", "default"):
    raise ValueError(
        "DIS_TPU_XLA_PRECISION must be 'highest' or 'default', got "
        f"{_prec_env!r}")
_XLA_PRECISION = {"highest": None, "default": "default"}[_prec_env]
_PREC = (lax.Precision.HIGHEST if _XLA_PRECISION is None
         else lax.Precision.DEFAULT)

# Region rows packed per gathered row. Counter-intuitively, 1 is the
# end-to-end winner at 1080p (9.40 vs 7.65 fps for 6): XLA fuses the
# unpacked sliding-window build into the row gather, while the packed
# variant materializes a ~1 GB intermediate and inflates the region
# tensor the iteration kernel reads by Rr/Rc. Packing only wins in
# isolation (17.5 vs 39 ms). Overridable for A/B benchmarking.
_ROW_PACK = int(_os.environ.get("DIS_TPU_ROW_PACK", "1"))


def region_shape(ps: int) -> Tuple[int, int]:
    """(rows, cols) of the per-patch sampling region."""
    rc = 2 * ps + 3
    rr = -(-rc // _ROW_PACK) * _ROW_PACK
    return rr, rc


def extract_regions(img2: jnp.ndarray, pos0: jnp.ndarray, ps: int,
                    pad: int, row0: int = 0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-patch sampling regions for one scale: [N, Rr, Rc] with
    Rc = 2*ps + 3 and Rr = Rc rounded up to the row-packing multiple.

    Outlier policing (patch.cpp:185-194) bounds every sampled position
    within ``ps/2`` of the scale's start position, so all of a patch's
    bilinear windows across all iterations live in a fixed
    (2*ps+1)^2 neighborhood of the start; the extra rows/cols cover
    float32 rounding slack at the policing boundary.  Every subsequent
    iteration samples from these regions without touching the image.

    TPU note: a naive per-row gather moves a full (8,128) tile per
    19-float row — 53x bandwidth waste.  We pack ``_ROW_PACK`` region
    rows per gathered row (sliding-window restructure), which measured
    2.2x faster than single-row gathers and 10x faster than element
    gathers at 1080p.

    Returns (regions, base_y, base_x) where base is the region origin
    in padded-image coordinates.
    """
    th, tw = img2.shape
    half = ps // 2
    rr, rc = region_shape(ps)
    groups = rr // _ROW_PACK
    n = pos0.shape[0]
    nudge = jnp.float32(1e-5)
    cpx0 = jnp.clip(jnp.ceil(pos0[:, 0] + nudge), -1e6, 1e6).astype(jnp.int32) + pad
    cpy0 = (jnp.clip(jnp.ceil(pos0[:, 1] + nudge), -1e6, 1e6).astype(jnp.int32)
            + pad - row0)
    base_y = jnp.clip(cpy0 - ps - 2, 0, th - rr)
    base_x = jnp.clip(cpx0 - half - 1 - (half + 1), 0, tw - rc)

    # Sliding windows along x: S[h, x, k] = img2[h, x + k], then pack
    # _ROW_PACK consecutive image rows per flat row.
    ncols = tw - rc + 1
    S = jnp.stack([img2[:, k:k + ncols] for k in range(rc)], axis=-1)
    hp = th - (_ROW_PACK - 1)
    Sp = jnp.concatenate([S[i:hp + i] for i in range(_ROW_PACK)], axis=-1)
    S2 = Sp.reshape(hp * ncols, _ROW_PACK * rc)
    goff = jnp.arange(groups) * _ROW_PACK                     # [G]
    rowidx = (base_y[:, None] + goff[None, :]) * ncols + base_x[:, None]
    regions = jnp.take(S2, rowidx.reshape(-1), axis=0).reshape(
        n, rr, rc)
    return regions, base_y, base_x


def sample_from_regions(regions: jnp.ndarray, base_y: jnp.ndarray,
                        base_x: jnp.ndarray, pos: jnp.ndarray, ps: int,
                        pad: int, normalize: bool,
                        row0: int = 0) -> jnp.ndarray:
    """Bilinear warped query patches from pre-extracted regions.

    Mathematically identical to :func:`sample_patches` (same ceil-nudge
    tap base Q10, same weight/tap pairing, separably factored): the
    4-tap bilinear combination factors into a row selector
    [(1-b) at window row j, b at j+1] and a column selector
    [(1-a) at i, a at i+1], applied as batched one-hot contractions —
    MXU work instead of a per-element gather (measured 6x faster).
    """
    n, rrows, rcols = regions.shape
    half = ps // 2
    posx = pos[:, 0].astype(jnp.float32)
    posy = pos[:, 1].astype(jnp.float32)
    a = posx - jnp.floor(posx)
    b = posy - jnp.floor(posy)

    nudge = jnp.float32(1e-5)
    cpx = jnp.clip(jnp.ceil(posx + nudge), -1e6, 1e6).astype(jnp.int32) + pad
    cpy = (jnp.clip(jnp.ceil(posy + nudge), -1e6, 1e6).astype(jnp.int32)
           + pad - row0)
    # local window start (row of tap W[0,0] = img[cpy-half-1])
    ws = jnp.clip(cpy - half - 1 - base_y, 0, rrows - (ps + 1))  # [N]
    cs = jnp.clip(cpx - half - 1 - base_x, 0, rcols - (ps + 1))

    jj = jnp.arange(ps)[None, :, None]       # output row j
    rr = jnp.arange(rrows)[None, None, :]    # region row r
    rs = ((rr == ws[:, None, None] + jj).astype(jnp.float32)
          * (1 - b)[:, None, None]
          + (rr == ws[:, None, None] + jj + 1).astype(jnp.float32)
          * b[:, None, None])                # [N, ps, Rr]
    cc = jnp.arange(rcols)[None, :, None]    # region col c
    ii = jnp.arange(ps)[None, None, :]       # output col i
    csel = ((cc == cs[:, None, None] + ii).astype(jnp.float32)
            * (1 - a)[:, None, None]
            + (cc == cs[:, None, None] + ii + 1).astype(jnp.float32)
            * a[:, None, None])              # [N, Rc, ps]

    # precision is load-bearing: on TPU the DEFAULT matmul precision
    # lowers this contraction to one truncating bf16 pass, silently
    # corrupting every sampled value on the kernel="xla" + region path
    # (CPU tests cannot catch it — CPU ignores precision).  HIGHEST
    # keeps the one-hot selector contraction exact (1.0/0.0 weights and
    # the bf16x3 re-sum of the region values are exact in f32).
    q = jnp.einsum("njr,nrc,nci->nji", rs, regions, csel,
                   preferred_element_type=jnp.float32,
                   precision=_PREC).reshape(n, ps * ps)
    if normalize:
        q = q - q.sum(axis=1, keepdims=True) * jnp.float32(1.0 / (ps * ps))
    return q


class SearchResult(NamedTuple):
    u: jnp.ndarray          # [N, 2] final displacement per patch
    Q: jnp.ndarray          # [N, ps*ps] final warped query patch
    converged: jnp.ndarray  # [N] bool
    start_oob: jnp.ndarray  # [N] bool: start position was out of bounds, so
    #                         the patch froze immediately and Q is the raw
    #                         template, not a resample (patch.cpp:132-136)


_EXTRACT = _os.environ.get("DIS_TPU_EXTRACT", "auto")


def extraction_route(cfg: DISConfig, img_shape, n_patches: int,
                     geom=None, init_bound=None) -> str:
    """Which extraction path :func:`inverse_search` takes for a scale:

    - ``"pallas_image"``  — whole-image VMEM kernel (fits <= ~1080p,
      <= 131072 patches)
    - ``"pallas_banded"`` — column-banded DMA kernel (any size, 4K+;
      REQUIRES a static |init| bound to size the bands)
    - ``"xla_regions"``   — XLA row-gather extraction (fallback)
    - ``"global_gather"`` — no region pre-extraction (sampler="global"
      + kernel="xla")

    Pure function of static inputs so tests can pin each config's path
    (round-2 VERDICT weak item #5: 4K + per-level refinement silently
    fell off the banded path because the refined init has no static
    bound; see config.py::refined_init_clamp for the fix, and the
    UserWarning inverse_search raises on that fallback).
    """
    import jax as _jax

    use_pallas = cfg.kernel == "pallas" or (
        cfg.kernel == "auto" and _jax.default_backend() != "cpu")
    use_regions = cfg.sampler == "region" or use_pallas
    if not use_regions:
        return "global_gather"
    from .pallas.extract_kernel import band_width_ok, vmem_ok

    rr, rc = region_shape(cfg.patch_size)
    on_tpu = use_pallas and rr == rc and _jax.default_backend() != "cpu"
    # SMEM budget for the whole-image kernel's scalar prefetch: two
    # s32[npad] base arrays + program overhead against the ~1 MB SMEM.
    # The old loose gate (n <= 131072, from "112k compiles / 200k
    # fails") admitted 130,560 patches (medium preset, 1080p,
    # coarsest_scale=4), which fails compilation 1.1 KB over budget —
    # model the bytes instead and leave 32 KB slack for the program.
    npad_est = -(-n_patches // 128) * 128
    smem_fits = 8 * npad_est + 32 * 1024 <= 1 << 20
    can_image = (_EXTRACT in ("auto", "image")
                 and vmem_ok(*img_shape, cfg.patch_size)
                 and smem_fits)
    can_banded = (_EXTRACT in ("auto", "banded") and geom is not None
                  and init_bound is not None
                  and band_width_ok(cfg.patch_size, init_bound))
    if on_tpu and can_image:
        return "pallas_image"
    if on_tpu and can_banded:
        return "pallas_banded"
    return "xla_regions"


def inverse_search(img2: jnp.ndarray, tpl: PatchTemplates,
                   centers: jnp.ndarray, init_u: jnp.ndarray,
                   cfg: DISConfig, width: int, height: int,
                   row0: int = 0, geom=None,
                   init_bound=None) -> SearchResult:
    """Run the full IC-LK iteration for every patch at one scale.

    Valid-region bounds from optical_flow.cpp:55-57:
    ``tmp_lb = -ps/2``, ``tmp_ub_w = w + ps/2 - 2``, ``tmp_ub_h = h + ps/2 - 2``.

    ``geom``/``init_bound`` (grid geometry and a static bound on
    ``|init_u|``) enable the column-banded Pallas extraction for frames
    whose padded image exceeds the VMEM budget (4K+); without them such
    frames fall back to the XLA extraction.
    """
    ps = cfg.patch_size
    pad = cfg.img_padding
    lb = jnp.float32(-float(ps) / 2.0)
    ub_w = jnp.float32(width + ps // 2 - 2)
    ub_h = jnp.float32(height + ps // 2 - 2)
    thresh = jnp.float32(cfg.outlier_thresh)
    fixed = cfg.mode == "fixed"

    Tn = tpl.T
    if fixed and cfg.patch_normalization:
        Tn = tpl.T - pairwise_sum(tpl.T)[:, None] * jnp.float32(1.0 / (ps * ps))

    def oob(p):
        return ((p[:, 0] < lb) | (p[:, 1] < lb)
                | (p[:, 0] > ub_w) | (p[:, 1] > ub_h))

    init_u = init_u.astype(jnp.float32)
    pos0 = centers + init_u
    start = pos0
    conv0 = oob(pos0)
    start_oob = conv0

    use_pallas = cfg.kernel == "pallas" or (
        cfg.kernel == "auto" and jax.default_backend() != "cpu")
    use_regions = cfg.sampler == "region" or use_pallas
    # Route decision is a pure function of static inputs (tested per
    # config in tests/test_extraction_route.py).  The whole-image
    # kernel's SMEM prefetch budget tops out between 112k (works) and
    # 200k (compile failure) patches; larger grids go banded.  The
    # extraction kernels run on real TPUs only (interpret mode is
    # prohibitively slow for CPU tests); bit-equivalence to the XLA
    # path is covered by tests/test_pallas_extract.py.
    route = extraction_route(cfg, img2.shape, pos0.shape[0],
                             geom=geom, init_bound=init_bound)

    if use_regions:
        from .pallas.extract_kernel import (band_width_ok,
                                            extract_regions_banded,
                                            extract_regions_pallas, vmem_ok)

        if route == "xla_regions" and jax.default_backend() != "cpu" \
                and use_pallas and not vmem_ok(*img2.shape, ps) \
                and geom is not None and init_bound is None:
            # The banded 4K path was available except for the missing
            # static |init| bound (per-level refinement erases it) —
            # a silent perf cliff in round 2; now loud.
            import warnings

            warnings.warn(
                "frame too large for the whole-image extraction kernel "
                "and no static init bound is available (per-level "
                "refinement?): falling back to XLA gather extraction. "
                "Set refined_init_clamp=True to restore the banded "
                "fast path (config.py).", UserWarning, stacklevel=2)

        if route == "pallas_image":
            # Emit regions already padded to the search kernel's block
            # multiple: skips the slice-to-N + re-pad round trip over
            # the [N, R, R] HBM array (3.1 ms at 1080p, device trace).
            from .pallas.iclk_kernel import search_padding
            _, npad_s = search_padding(pos0.shape[0])
            regions, base_y, base_x = extract_regions_pallas(
                img2, pos0, ps, pad, row0=row0, pad_to=npad_s)
        elif route == "pallas_banded":
            # Column-banded DMA extraction: any resolution (4K+), VMEM
            # holds only one grid column's band.
            regions, base_y, base_x = extract_regions_banded(
                img2, pos0, ps, pad, geom.num_w, geom.num_h, row0=row0)
        else:
            regions, base_y, base_x = extract_regions(img2, pos0, ps, pad,
                                                      row0=row0)

        def sampler(pos):
            return sample_from_regions(regions, base_y, base_x, pos, ps, pad,
                                       cfg.patch_normalization, row0=row0)
    else:
        def sampler(pos):
            return sample_patches(img2, pos, ps, pad,
                                  cfg.patch_normalization, row0=row0)

    if use_pallas:
        from .pallas.iclk_kernel import inverse_search_pallas

        u, q, conv = inverse_search_pallas(
            regions, base_y, base_x, tpl.T, tpl.Tdx, tpl.Tdy, tpl.Hinv,
            centers, init_u, conv0, cfg, width, height, row0=row0,
            interpret=jax.default_backend() == "cpu")
        _guard_result(u, q, centers, init_u, pos0, thresh, cfg)
        return SearchResult(u=u, Q=q, converged=conv, start_oob=conv0)

    Q0 = jnp.where(conv0[:, None], tpl.T, sampler(pos0))

    # Under shard_map the loop carry must have a consistent
    # varying-across-devices type: at the coarsest scale ``init_u`` is a
    # replicated constant while the body makes ``u``/``converged``
    # device-varying.  Seed both from the (always-varying) image via an
    # identically-False predicate (NaN-safe: NaN - NaN > 1 is False).
    vfalse = (img2.ravel()[0] - img2.ravel()[0]) > jnp.float32(1.0)
    u0 = jnp.where(vfalse, jnp.float32(0), init_u)
    conv0 = jnp.where(vfalse, True, conv0)

    def body(state):
        it, u, Q, converged = state
        active = ~converged
        R = Q - Tn if fixed else Q
        rhs = jnp.stack([(tpl.Tdx * R).sum(axis=1),
                         (tpl.Tdy * R).sum(axis=1)], -1)
        # HIGHEST: keep the 2x2 solve in true f32 if XLA routes this
        # batched matvec to the MXU (default precision would truncate
        # Hinv/rhs to one bf16 pass on TPU).
        delta = jnp.einsum("nij,nj->ni", tpl.Hinv, rhs, precision=_PREC)
        u_new = u - delta
        p_new = centers + u_new
        d = start - p_new
        dist = jnp.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])
        policed = (dist > thresh) | oob(p_new)
        u_next = jnp.where(policed[:, None], init_u, u_new)
        u = jnp.where(active[:, None], u_next, u)
        pos = centers + u
        Qs = sampler(pos)
        Q = jnp.where(active[:, None], Qs, Q)
        newly_done = active & policed
        if fixed:
            small = jnp.sqrt((delta * delta).sum(-1)) < jnp.float32(cfg.conv_eps)
            newly_done = newly_done | (active & small)
        return it + 1, u, Q, converged | newly_done

    n_iters = cfg.iterations + 1  # counter_iter runs 1..iterations+1

    if cfg.early_exit:
        def cond(state):
            it, _, _, converged = state
            return (it < n_iters) & (~jnp.all(converged))
        _, u, Q, converged = lax.while_loop(cond, body, (0, u0, Q0, conv0))
    else:
        def fbody(i, state):
            return body(state)
        _, u, Q, converged = lax.fori_loop(0, n_iters, fbody, (0, u0, Q0, conv0))
    _guard_result(u, Q, centers, init_u, pos0, thresh, cfg)
    return SearchResult(u=u, Q=Q, converged=converged, start_oob=start_oob)


def _guard_result(u, Q, centers, init_u, start, thresh, cfg) -> None:
    """DIS_TPU_CHECK invariants on a scale's search result: finite
    state, and the Q9 policing guarantee — every patch's final position
    is within ``outlier_thresh`` of its start OR exactly reset to the
    init (patch.cpp:185-194).  No-ops unless checks are enabled."""
    from ..utils import checks

    if not checks.enabled():
        return
    checks.check(jnp.isfinite(u).all(), "IC-LK produced non-finite u")
    checks.check(jnp.isfinite(Q).all(), "IC-LK produced non-finite Q")
    d = start - (centers + u)
    dist = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    at_init = jnp.all(u == init_u, axis=1)
    ok = (dist <= jnp.float32(thresh) + 1e-3) | at_init
    checks.check(ok.all(), "policing invariant violated: patch moved "
                 "beyond outlier_thresh without reset")
