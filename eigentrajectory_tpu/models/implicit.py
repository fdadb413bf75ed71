"""ET-Social-Implicit: speed-zone-routed conv cells in ET coefficient space.

Rebuilt from baseline/implicit/model.py (SocialImplicitLight, model.py:126-159):
peds are bucketized into "social zones" by the magnitude of their first ET
coefficient (the inf-norm reduces to |c_0| since motion_dim=1, model.py:144-147)
and each zone's peds are routed through a per-zone SocialCellGlobal (global 2D
conv stream + per-ped local 1D stream, model.py:44-88). Noise is forced to
zeros with KSTEPS=1 (model.py:149-150); the learnable noise_w/global_w/local_w
scalars remain. ET wiring: spatial 1->s, temporal k+2->k, bins [0,.01,.1,1.2]
(utils/trainer.py:554-561).

Zone routing gathers a compacted subset in the reference (v[..., select]),
and the global cell's 3x3 conv mixes *adjacent peds of the compacted subset*.
To reproduce exactly under static shapes, each zone's peds are compacted to
the front with a stable argsort permutation, processed masked, and scattered
back — identical neighborhoods, no recompilation.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchConv2d, zero_invalid

BINS = (0.0, 0.01, 0.1, 1.2)
NOISE_WEIGHT = (0.05, 1, 4, 8)


class Conv1dTorch(nn.Module):
    """torch.nn.Conv1d equivalent (NCL layout, torch init)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        # implement as a (k, 1) Conv2d over (L, 1)
        y = TorchConv2d(self.in_channels, self.out_channels,
                        (self.kernel_size, 1), padding=(self.padding, 0),
                        name="conv")(x[..., None])
        return y[..., 0]


class SocialCellLocal(nn.Module):
    """SocialCellLocal (model.py:9-41): per-ped 1D conv streams (no ped mixing)."""

    spatial_input: int
    spatial_output: int
    temporal_input: int
    temporal_output: int

    @nn.compact
    def __call__(self, v):
        # v: (1, C, T, V)
        v_shape = v.shape
        # (1, C, T, V) -> (V, C, T)  (model.py:31-32)
        h = jnp.transpose(v, (0, 3, 1, 2)).reshape(
            v_shape[0] * v_shape[3], self.spatial_input, self.temporal_input)
        res = Conv1dTorch(self.spatial_input, self.spatial_output, 1,
                          name="highway_input")(h)
        h = nn.relu(Conv1dTorch(self.spatial_input, self.spatial_output, 3,
                                padding=1, name="feat")(h)) + res
        h = jnp.transpose(h, (0, 2, 1))                  # (V, T, C)
        res = Conv1dTorch(self.temporal_input, self.temporal_output, 1,
                          name="highway")(h)
        h = Conv1dTorch(self.temporal_input, self.temporal_output, 3,
                        padding=1, name="tpcnn")(h) + res
        h = h.reshape(v_shape[0], v_shape[3], self.spatial_output,
                      self.temporal_output)
        return jnp.transpose(h, (0, 2, 3, 1))            # (1, C_out, T_out, V)


class SocialCellGlobal(nn.Module):
    """SocialCellGlobal (model.py:44-88): 2D conv global stream + local stream,
    fused by learned scalars."""

    spatial_input: int
    spatial_output: int
    temporal_input: int
    temporal_output: int

    @nn.compact
    def __call__(self, v, valid, noise=None, noise_scale: float = 1.0):
        # v: (B, C, T, V). The Light variant passes no noise so the noise_w
        # term vanishes, but the parameter exists (model.py:60-63); the full
        # SocialImplicit adds noise_w * noise_weights[zone] * noise to the
        # input (model.py:75-78), broadcasting the (KSTEPS, C, 1, 1) draw to
        # a KSTEPS-sample batch.
        noise_w = self.param("noise_w", nn.initializers.zeros, (1,))
        global_w = self.param("global_w", nn.initializers.zeros, (1,))
        local_w = self.param("local_w", nn.initializers.zeros, (1,))
        if noise is not None:
            v = v + noise_w * noise_scale * noise

        v_ped = SocialCellLocal(self.spatial_input, self.spatial_output,
                                self.temporal_input, self.temporal_output,
                                name="ped")(v)

        v = zero_invalid(v, valid, 3)
        res = TorchConv2d(self.spatial_input, self.spatial_output, (1, 1),
                          name="highway_input")(v)
        h = nn.relu(TorchConv2d(self.spatial_input, self.spatial_output,
                                (3, 3), padding=(1, 1), name="feat")(v)) + res
        h = jnp.transpose(h, (0, 2, 1, 3))               # (1, T, C, V)
        h = zero_invalid(h, valid, 3)
        res = TorchConv2d(self.temporal_input, self.temporal_output, (1, 1),
                          name="highway")(h)
        h = TorchConv2d(self.temporal_input, self.temporal_output, (3, 3),
                        padding=(1, 1), name="tpcnn")(h) + res
        h = jnp.transpose(h, (0, 2, 1, 3))               # (1, C, T_out, V)
        return global_w * h + local_w * v_ped


class SocialImplicitLight(nn.Module):
    """SocialImplicitLight (model.py:126-159) with zone compaction."""

    spatial_input: int = 1
    spatial_output: int = 20
    temporal_input: int = 8
    temporal_output: int = 6

    @nn.compact
    def __call__(self, v, valid, train: bool = False):
        # v: (1, C=1, T, V)
        n = v.shape[-1]
        bins = jnp.asarray(BINS, v.dtype)
        # zone = |first-timestep coefficient| bucketized (model.py:144-147;
        # the inf-norm over a single channel at t=0 is an absolute value).
        norm = jnp.abs(v[0, 0, 0, :])                    # (V,)
        zone = jnp.sum(norm[None, :] >= bins[:, None], axis=0) - 1
        zone = jnp.clip(zone, 0, len(BINS) - 1)

        out = jnp.zeros((v.shape[0], self.spatial_output, self.temporal_output, n),
                        v.dtype)
        for i in range(len(BINS)):
            sel = (zone == i) & valid
            # Stable compaction: zone members first, original order kept —
            # the conv neighborhoods match the reference's gathered subset.
            order = jnp.argsort(~sel, stable=True)
            inv_order = jnp.argsort(order, stable=True)
            sel_sorted = sel[order]
            v_i = zero_invalid(v[..., order], sel_sorted, 3)
            out_i = SocialCellGlobal(
                self.spatial_input, self.spatial_output, self.temporal_input,
                self.temporal_output, name=f"cell_{i}")(v_i, sel_sorted)
            out_i = out_i[..., inv_order]                # scatter back
            out = jnp.where(sel[None, None, None, :], out_i, out)
        return out


class SocialImplicit(nn.Module):
    """Full SocialImplicit (model.py:91-123) — DORMANT in the ET pipeline
    (the trainer instantiates SocialImplicitLight, implicit/__init__.py:1).
    Provided for reference-component completeness; pinned by
    tests/test_dormant_stochastic.py.

    Differences vs Light: 2 spatial channels (x, y), KSTEPS output samples
    produced by a shared N(0, I2) draw scaled per zone by the learned noise_w
    times the fixed noise_weight, and the zone key is the inf-norm over both
    channels at the first timestep (model.py:113-115). `noise` injects the
    (KSTEPS, C) standard-normal draw for deterministic tests; otherwise it
    comes from the 'noise' RNG stream.
    """

    spatial_input: int = 2
    spatial_output: int = 2
    temporal_input: int = 8
    temporal_output: int = 12

    @nn.compact
    def __call__(self, v, valid, ksteps: int = 20, noise=None,
                 train: bool = False):
        # v: (1, C, T, V)
        n = v.shape[-1]
        bins = jnp.asarray(BINS, v.dtype)
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"),
                                      (ksteps, self.spatial_input))
        noise = noise[:, :, None, None].astype(v.dtype)
        norm = jnp.max(jnp.abs(v[0, :, 0, :]), axis=0)   # (V,) inf-norm @ t=0
        zone = jnp.sum(norm[None, :] >= bins[:, None], axis=0) - 1
        zone = jnp.clip(zone, 0, len(BINS) - 1)

        out = jnp.zeros((noise.shape[0], self.spatial_output,
                         self.temporal_output, n), v.dtype)
        for i in range(len(BINS)):
            sel = (zone == i) & valid
            order = jnp.argsort(~sel, stable=True)
            inv_order = jnp.argsort(order, stable=True)
            sel_sorted = sel[order]
            v_i = zero_invalid(v[..., order], sel_sorted, 3)
            out_i = SocialCellGlobal(
                self.spatial_input, self.spatial_output, self.temporal_input,
                self.temporal_output, name=f"cell_{i}")(
                    v_i, sel_sorted, noise=noise,
                    noise_scale=NOISE_WEIGHT[i])
            out_i = out_i[..., inv_order]
            out = jnp.where(sel[None, None, None, :], out_i, out)
        return out


def make_model(cfg):
    return SocialImplicitLight(spatial_input=1, spatial_output=cfg.num_samples,
                               temporal_input=cfg.k + 2, temporal_output=cfg.k)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (implicit/bridge.py:4-11): NCTV permute only."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)
    obs = zero_invalid(obs, valid, axis=1)
    v = jax.lax.stop_gradient(obs)[None, None]           # (1, 1, T, V)
    return (v, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (implicit/bridge.py:19-23): (1, s, k, V) -> (k, V, s)."""
    return jnp.transpose(output_data, (0, 2, 3, 1))[0]


BATCHING = "sequenced"
