"""Fused Pallas TPU kernel: ET reconstruction + denormalization + branch select.

The reference reconstructs trajectories sample-by-sample in Python
(descriptor.py:173-174) and keeps the moving/static split as two separate
module calls (model.py:102-105). This kernel fuses, per 128-ped lane tile:

    M_m = U_pred_m @ C_m      (MXU, 24x6 @ 6x128 per sample)
    M_s = U_pred_s @ C_s
    denormalize both branches (VPU: scale, rotate, translate)
    select by the moving mask

into a single VMEM-resident pass over all s samples — one HBM read of the
coefficients, one HBM write of the trajectories, nothing materialized in
between.

Used on the evaluation path (cfg.use_pallas); training keeps the XLA einsum
path so autodiff applies (the op is linear in C, and XLA's own fusion is
already near-optimal there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(u_m_ref, u_s_ref, c_m_ref, c_s_ref, p_ref, out_ref):
    """One 128-ped tile, all samples.

    u_*_ref: (T*2, k); c_*_ref: (S, k, 128); p_ref: (8, 128) packed params
    [r00, r01, r10, r11, ori_x, ori_y, inv_sca, mask_m]; out_ref: (S, T*2, 128).
    """
    u_m = u_m_ref[:]
    u_s = u_s_ref[:]
    p = p_ref[:]
    r00, r01, r10, r11 = p[0:1], p[1:2], p[2:3], p[3:4]
    ori_x, ori_y = p[4:5], p[5:6]
    inv_sca = p[6:7]
    mask_m = p[7:8]
    t2 = u_m.shape[0]
    t = t2 // 2
    n_samples = c_m_ref.shape[0]

    def one_sample(si, _):
        m_m = jnp.dot(u_m, c_m_ref[si], preferred_element_type=jnp.float32)
        m_s = jnp.dot(u_s, c_s_ref[si], preferred_element_type=jnp.float32)

        def denorm(m, use_sca):
            xy = m.reshape(t, 2, LANES)
            x, y = xy[:, 0], xy[:, 1]                     # (T, 128)
            if use_sca:
                x, y = x * inv_sca, y * inv_sca
            # right-multiply by rot^T (normalizer.py:53-62)
            x2 = x * r00 + y * r01
            y2 = x * r10 + y * r11
            return x2 + ori_x, y2 + ori_y

        xm, ym = denorm(m_m, True)
        xs, ys = denorm(m_s, False)
        x = jnp.where(mask_m > 0, xm, xs)
        y = jnp.where(mask_m > 0, ym, ys)
        out_ref[si] = jnp.stack([x, y], axis=1).reshape(t2, LANES)
        return 0

    jax.lax.fori_loop(0, n_samples, one_sample, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_reconstruct(
    c_m: jnp.ndarray,      # (k, N, S) moving-branch coefficients
    c_s: jnp.ndarray,      # (k, N, S) static-branch coefficients
    u_m: jnp.ndarray,      # (T*2, k)
    u_s: jnp.ndarray,      # (T*2, k)
    ori: jnp.ndarray,      # (N, 2)
    rot: jnp.ndarray,      # (N, 2, 2)
    sca: jnp.ndarray,      # (N,)
    mask_m: jnp.ndarray,   # (N,) bool
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns reconstructed trajectories (S, N, T, 2) in world coordinates."""
    k, n, s = c_m.shape
    t2 = u_m.shape[0]
    n_pad = (n + LANES - 1) // LANES * LANES

    def pad(x, axis):
        width = [(0, 0)] * x.ndim
        width[axis] = (0, n_pad - n)
        return jnp.pad(x, width)

    c_m_p = pad(jnp.transpose(c_m, (2, 0, 1)), 2).astype(jnp.float32)  # (S,k,Np)
    c_s_p = pad(jnp.transpose(c_s, (2, 0, 1)), 2).astype(jnp.float32)
    params = jnp.stack([
        rot[:, 0, 0], rot[:, 0, 1], rot[:, 1, 0], rot[:, 1, 1],
        ori[:, 0], ori[:, 1],
        jnp.where(sca != 0, 1.0 / jnp.where(sca != 0, sca, 1.0), 0.0),
        mask_m.astype(jnp.float32),
    ], axis=0).astype(jnp.float32)                                      # (8, N)
    params = pad(params, 1)

    grid = (n_pad // LANES,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((s, t2, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t2, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, t2, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_m.astype(jnp.float32), u_s.astype(jnp.float32), c_m_p, c_s_p, params)

    out = out[:, :, :n]                                   # (S, T*2, N)
    return jnp.transpose(out, (0, 2, 1)).reshape(s, n, t2 // 2, 2)


def _recon_metrics_kernel(u_m_ref, u_s_ref, c_m_ref, c_s_ref, p_ref, gt_ref,
                          sel_ref, red_ref, out_ref, met_ref):
    """Recon + min-of-S ADE/FDE + best-FDE-sample TCC in one tile pass.

    gt_ref: (T*2, 128) ground-truth pred trajectory (x rows interleaved with y
    rows, same layout as the output); met_ref: (8, 128) with rows
    [ade, fde, tcc, 0...].

    Mosaic cannot reduce over a sublane dimension whose layout carries offsets
    (which strided row slices like `m.reshape(t,2,L)[:, 0]` produce), so every
    even/odd-row selection and every time reduction here is a small constant
    matmul on the MXU instead — selection matrices pick x/y rows and
    ones-rows compute sums/means; elementwise ops stay on the VPU. The
    constant matrices arrive as kernel operands (sel_ref (2t, t2): stacked
    [sel_x; sel_y]; red_ref (8, t): rows [mean, sum, last, 0...]) because
    Mosaic folds in-kernel iota+cast into an unsupported float iota.
    """
    u_m = u_m_ref[:]
    u_s = u_s_ref[:]
    p = p_ref[:]
    r00, r01, r10, r11 = p[0:1], p[1:2], p[2:3], p[3:4]
    ori_x, ori_y = p[4:5], p[5:6]
    inv_sca = p[6:7]
    mask_m = p[7:8]
    t2 = u_m.shape[0]
    t = t2 // 2
    n_samples = c_m_ref.shape[0]

    sel_x = sel_ref[:t]                                    # (t, t2)
    sel_y = sel_ref[t:]
    mean_row = red_ref[0:1]                                # (1, t)
    sum_row = red_ref[1:2]
    last_row = red_ref[2:3]

    def dotf(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    gx = dotf(sel_x, gt_ref[:])                            # (T, 128)
    gy = dotf(sel_y, gt_ref[:])

    big = jnp.full((1, LANES), 1e30, jnp.float32)
    zeros_t = jnp.zeros((t, LANES), jnp.float32)

    def one_sample(si, carry):
        min_ade, min_fde, best_x, best_y = carry
        m_m = dotf(u_m, c_m_ref[si])
        m_s = dotf(u_s, c_s_ref[si])

        def denorm(m, use_sca):
            x, y = dotf(sel_x, m), dotf(sel_y, m)          # (T, 128) clean
            if use_sca:
                x, y = x * inv_sca, y * inv_sca
            x2 = x * r00 + y * r01
            y2 = x * r10 + y * r11
            return x2 + ori_x, y2 + ori_y

        xm, ym = denorm(m_m, True)
        xs, ys = denorm(m_s, False)
        x = jnp.where(mask_m > 0, xm, xs)                 # (T, 128)
        y = jnp.where(mask_m > 0, ym, ys)
        out_ref[si] = jnp.stack([x, y], axis=1).reshape(t2, LANES)

        dist = jnp.sqrt((x - gx) ** 2 + (y - gy) ** 2)    # (T, 128)
        ade_s = dotf(mean_row, dist)                       # (1, 128)
        fde_s = dotf(last_row, dist)
        # strict < keeps the FIRST minimal sample (torch argmin tie-break)
        better = fde_s < min_fde
        best_x = jnp.where(better, x, best_x)
        best_y = jnp.where(better, y, best_y)
        return (jnp.minimum(min_ade, ade_s), jnp.where(better, fde_s, min_fde),
                best_x, best_y)

    min_ade, min_fde, best_x, best_y = jax.lax.fori_loop(
        0, n_samples, one_sample, (big, big, zeros_t, zeros_t))

    # TCC of the best-FDE sample (metrics.py:105-130): Pearson corr per
    # coordinate between best and gt over time, averaged over x/y.
    def corr(a, b):
        am = a - dotf(mean_row, a)
        bm = b - dotf(mean_row, b)
        cov = dotf(sum_row, am * bm)
        var_a = dotf(sum_row, am * am)
        var_b = dotf(sum_row, bm * bm)
        denom = jnp.sqrt(var_a * var_b)
        c = jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0), 0.0)
        return jnp.clip(c, -1.0, 1.0)

    tcc = 0.5 * (corr(best_x, gx) + corr(best_y, gy))     # (1, 128)
    met = jnp.concatenate(
        [min_ade, min_fde, tcc, jnp.zeros((5, LANES), jnp.float32)], axis=0)
    met_ref[:] = met


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_recon_metrics(
    c_m: jnp.ndarray,      # (k, N, S)
    c_s: jnp.ndarray,      # (k, N, S)
    u_m: jnp.ndarray,      # (T*2, k)
    u_s: jnp.ndarray,      # (T*2, k)
    ori: jnp.ndarray,      # (N, 2)
    rot: jnp.ndarray,      # (N, 2, 2)
    sca: jnp.ndarray,      # (N,)
    mask_m: jnp.ndarray,   # (N,) bool
    gt: jnp.ndarray,       # (N, T, 2) ground-truth future
    interpret: bool = False,
):
    """Returns (recon (S, N, T, 2), ade (N,), fde (N,), tcc (N,)) — the full
    coefficients -> trajectories -> per-ped metrics pipeline in one kernel."""
    k, n, s = c_m.shape
    t2 = u_m.shape[0]
    n_pad = (n + LANES - 1) // LANES * LANES

    def pad(x, axis):
        width = [(0, 0)] * x.ndim
        width[axis] = (0, n_pad - n)
        return jnp.pad(x, width)

    c_m_p = pad(jnp.transpose(c_m, (2, 0, 1)), 2).astype(jnp.float32)
    c_s_p = pad(jnp.transpose(c_s, (2, 0, 1)), 2).astype(jnp.float32)
    params = jnp.stack([
        rot[:, 0, 0], rot[:, 0, 1], rot[:, 1, 0], rot[:, 1, 1],
        ori[:, 0], ori[:, 1],
        jnp.where(sca != 0, 1.0 / jnp.where(sca != 0, sca, 1.0), 0.0),
        mask_m.astype(jnp.float32),
    ], axis=0).astype(jnp.float32)
    params = pad(params, 1)
    # (N, T, 2) -> (T*2, N) interleaved rows
    gt_p = pad(jnp.transpose(gt.reshape(n, t2), (1, 0)).astype(jnp.float32), 1)

    # Host-built constant matrices (see kernel docstring).
    import numpy as onp

    t = t2 // 2
    sel = onp.zeros((2 * t, t2), onp.float32)
    sel[onp.arange(t), 2 * onp.arange(t)] = 1.0           # sel_x
    sel[t + onp.arange(t), 2 * onp.arange(t) + 1] = 1.0   # sel_y
    red = onp.zeros((8, t), onp.float32)
    red[0] = 1.0 / t                                       # mean row
    red[1] = 1.0                                           # sum row
    red[2, t - 1] = 1.0                                    # last-step row

    grid = (n_pad // LANES,)
    out, met = pl.pallas_call(
        _recon_metrics_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, t2, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t2, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * t, t2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((s, t2, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(u_m.astype(jnp.float32), u_s.astype(jnp.float32), c_m_p, c_s_p, params,
      gt_p, jnp.asarray(sel), jnp.asarray(red))

    recon = jnp.transpose(out[:, :, :n], (0, 2, 1)).reshape(s, n, t2 // 2, 2)
    return recon, met[0, :n], met[1, :n], met[2, :n]
