"""Pure-functional trajectory normalization.

Replaces the reference's stateful TrajNorm (EigenTrajectory/normalizer.py:4-62)
whose parameters are written in `projection` and read back later in the same
forward (descriptor.py:157 / model.py:86). Here the parameters are an explicit
pytree computed once from the observed trajectory and threaded through.

Semantics (normalizer.py:17-62):
  origin  = last observed point
  rotation = heading angle atan2 of (last - 3rd-last)
  scale   = 2 / ||last - 3rd-last||            (NO NaN guard in the reference;
            the commented-out guard at normalizer.py:29 is off. For static
            peds the scale can blow up, but the moving-descriptor output for
            those peds is discarded by the mask split, so we guard the
            *denominator only* to keep gradients NaN-free without changing any
            used value.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class NormParams(NamedTuple):
    """Per-ped normalization parameters. All leading dims = ped axis N."""

    ori: jnp.ndarray  # (N, 1, 2) translation origin
    rot: jnp.ndarray  # (N, 2, 2) rotation matrix (right-multiplied)
    sca: jnp.ndarray  # (N, 1, 1) scale factor


def compute_norm_params(traj: jnp.ndarray, eps: float = 0.0) -> NormParams:
    """Compute normalization params from an observed trajectory (N, T, 2).

    Mirrors TrajNorm.calculate_params (normalizer.py:17-29). `eps > 0` guards
    the scale denominator; use it only when the scaled result is masked out
    downstream (see module docstring).
    """
    ori = traj[:, -1:, :]                           # (N, 1, 2)
    d = traj[:, -1, :] - traj[:, -3, :]             # (N, 2)
    rot_ang = jnp.arctan2(d[:, 1], d[:, 0])
    c, s = jnp.cos(rot_ang), jnp.sin(rot_ang)
    # Row-stacked as in normalizer.py:25-26: [[cos, -sin], [sin, cos]]
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=1), jnp.stack([s, c], axis=1)], axis=1
    )                                               # (N, 2, 2)
    norm = jnp.linalg.norm(d, axis=-1)
    if eps:
        norm = jnp.maximum(norm, eps)
    sca = (2.0 / norm)[:, None, None]               # (N, 1, 1)
    return NormParams(ori=ori, rot=rot, sca=sca)


def normalize(
    traj: jnp.ndarray,
    p: NormParams,
    ori: bool = True,
    rot: bool = True,
    sca: bool = True,
) -> jnp.ndarray:
    """Apply normalization (normalizer.py:42-51). traj: (N, T, 2)."""
    if ori:
        traj = traj - p.ori
    if rot:
        traj = traj @ p.rot
    if sca:
        traj = traj * p.sca
    return traj


def denormalize(
    traj: jnp.ndarray,
    p: NormParams,
    ori: bool = True,
    rot: bool = True,
    sca: bool = True,
) -> jnp.ndarray:
    """Invert normalization exactly (normalizer.py:53-62).

    traj may carry extra leading sample axes: (..., N, T, 2) with params
    broadcasting over the leading axes.
    """
    if sca:
        traj = traj / p.sca
    if rot:
        traj = traj @ jnp.swapaxes(p.rot, -1, -2)
    if ori:
        traj = traj + p.ori
    return traj
