"""ET-AgentFormer: agent-aware transformer predictor in ET coefficient space.

Rebuilt from the behaviour of baseline/agentformer/model.py (AgentFormerLight)
and agentformer_lib.py (agent-aware attention: dual inter/self QK projections
blended by a same-agent block mask, agentformer_lib.py:294-313), with the ET
wiring past_frames=k+2, future_frames=k, motion_dim=1, forecast_dim=s,
input/pred type 'pos', nz=0, no AR training, no learned prior
(utils/trainer.py:387-393) and agentformer_pre.yml hyper-params
(tf_model_dim=256, tf_ff_dim=512, tf_nhead=8, tf_dropout=0.1, 2+2 layers,
pos_concat=True).

Key structural simplification, justified by the reference's own dataflow: in
decode_traj_batch with nz=0 the autoregressive feedback re-appends the ORIGINAL
last-observed token instead of the prediction (model.py:377 `in_arr = ... else
[dec_in]`), so iteration i's decoder input is i+1 copies of dec_in, independent
of earlier outputs. Only the final iteration's seq_out is used (model.py:384).
The k-iteration Python loop is therefore exactly ONE decoder pass over k
repeated tokens with the causal ar mask (model.py:15-23) — implemented that way
here; outputs are mathematically identical and k-times cheaper.

Sequence layout is time-major agent-interleaved (index = t * N + a), as in the
reference (model.py:160-163). Padded agents are masked additively in every
attention (the reference's agent_mask is all-zeros, model.py:530-534, so valid
lanes see identical logits).
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import TorchLinear, zero_invalid

TF_MODEL_DIM = 256
TF_FF_DIM = 512
TF_NHEAD = 8
TF_DROPOUT = 0.1
NLAYER_ENC = 2
NLAYER_DEC = 2


def positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal table (model.py:55-63)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class XavierLinear(nn.Module):
    """Linear with torch xavier_uniform weight + zero bias (the init used for
    attention projections, agentformer_lib.py:448-462)."""

    features: int

    @nn.compact
    def __call__(self, x):
        # torch weight (out, in) and jax kernel (in, out) give the same
        # xavier fan pair, so bounds match.
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ kernel + bias


class AgentAwareAttention(nn.Module):
    """Agent-aware MHA (agentformer_lib.py:284-345, sep_attn=True,
    gaussian_kernel=False).

    For self-attention, q/k/v come from one fused projection; for cross
    attention q uses the first E rows and k/v the remaining 2E rows
    (agentformer_lib.py:145-180). The inter/self logits are blended by the
    same-agent mask: w = inter*(1-M) + self*M with M[l,l'] = [l==l' (mod N)].
    """

    embed_dim: int = TF_MODEL_DIM
    num_heads: int = TF_NHEAD
    dropout: float = TF_DROPOUT

    @nn.compact
    def __call__(self, query, key, same_agent, attn_bias, train: bool = False):
        # query: (L, E); key: (S, E); same_agent: (L, S); attn_bias: (L, S).
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        scaling = hd ** -0.5

        qkv_w = XavierLinear
        if query is key:
            fused = qkv_w(3 * e, name="in_proj")(query)
            q, k, v = jnp.split(fused, 3, axis=-1)
            fused_self = qkv_w(2 * e, name="in_proj_self")(query)
            q_self, k_self = jnp.split(fused_self, 2, axis=-1)
        else:
            w = self.param("in_proj_kernel", nn.initializers.xavier_uniform(),
                           (e, 3 * e))
            b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
            q = query @ w[:, :e] + b[:e]
            kv = key @ w[:, e:] + b[e:]
            k, v = jnp.split(kv, 2, axis=-1)
            ws = self.param("in_proj_self_kernel", nn.initializers.xavier_uniform(),
                            (e, 2 * e))
            bs = self.param("in_proj_self_bias", nn.initializers.zeros, (2 * e,))
            q_self = query @ ws[:, :e] + bs[:e]
            k_self = key @ ws[:, e:] + bs[e:]

        q, q_self = q * scaling, q_self * scaling

        def heads(x):  # (L, E) -> (H, L, hd)
            return x.reshape(-1, h, hd).transpose(1, 0, 2)

        inter = heads(q) @ jnp.swapaxes(heads(k), -1, -2)        # (H, L, S)
        own = heads(q_self) @ jnp.swapaxes(heads(k_self), -1, -2)
        m = same_agent.astype(inter.dtype)[None]
        w_att = inter * (1 - m) + own * m + attn_bias[None]
        w_att = jax.nn.softmax(w_att, axis=-1)
        w_att = nn.Dropout(self.dropout, deterministic=not train)(w_att)
        out = w_att @ heads(v)                                    # (H, L, hd)
        out = out.transpose(1, 0, 2).reshape(-1, e)
        return TorchLinear(e, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """AgentFormerEncoderLayer (agentformer_lib.py:528-585): post-LN."""

    @nn.compact
    def __call__(self, src, same_agent, attn_bias, train: bool):
        h = AgentAwareAttention(name="self_attn")(src, src, same_agent, attn_bias, train)
        src = src + nn.Dropout(TF_DROPOUT, deterministic=not train)(h)
        src = nn.LayerNorm(name="norm1")(src)
        h = TorchLinear(TF_FF_DIM, name="linear1")(src)
        h = nn.Dropout(TF_DROPOUT, deterministic=not train)(nn.relu(h))
        h = TorchLinear(TF_MODEL_DIM, name="linear2")(h)
        src = src + nn.Dropout(TF_DROPOUT, deterministic=not train)(h)
        return nn.LayerNorm(name="norm2")(src)


class DecoderLayer(nn.Module):
    """AgentFormerDecoderLayer (agentformer_lib.py:588-664)."""

    @nn.compact
    def __call__(self, tgt, memory, sa_tgt, bias_tgt, sa_mem, bias_mem, train: bool):
        h = AgentAwareAttention(name="self_attn")(tgt, tgt, sa_tgt, bias_tgt, train)
        tgt = tgt + nn.Dropout(TF_DROPOUT, deterministic=not train)(h)
        tgt = nn.LayerNorm(name="norm1")(tgt)
        h = AgentAwareAttention(name="multihead_attn")(tgt, memory, sa_mem, bias_mem, train)
        tgt = tgt + nn.Dropout(TF_DROPOUT, deterministic=not train)(h)
        tgt = nn.LayerNorm(name="norm2")(tgt)
        h = TorchLinear(TF_FF_DIM, name="linear1")(tgt)
        h = nn.Dropout(TF_DROPOUT, deterministic=not train)(nn.relu(h))
        h = TorchLinear(TF_MODEL_DIM, name="linear2")(h)
        tgt = tgt + nn.Dropout(TF_DROPOUT, deterministic=not train)(h)
        return nn.LayerNorm(name="norm3")(tgt)


class PosEncodeConcat(nn.Module):
    """PositionalAgentEncoding with pos_concat=True (model.py:33-102):
    fc([x, pe]) followed by dropout."""

    @nn.compact
    def __call__(self, x, t_len, n_agent, train: bool):
        pe = jnp.asarray(positional_encoding(t_len, TF_MODEL_DIM))
        pe = jnp.repeat(pe, n_agent, axis=0)                      # (T*N, E)
        h = jnp.concatenate([x, pe], axis=-1)
        h = TorchLinear(TF_MODEL_DIM, name="fc")(h)
        return nn.Dropout(TF_DROPOUT, deterministic=not train)(h)


class AgentFormerLight(nn.Module):
    """AgentFormerLight (model.py:440-539) under the ET wiring."""

    past_frames: int     # k + 2
    future_frames: int   # k
    forecast_dim: int    # s
    # conn_dist masking branch (model.py:522-534): agents farther than
    # conn_dist/traj_scale at the last observed step cannot attend to each
    # other. The reference default (1e5) disables it; the ET configs never set
    # it, but the capability is kept for config parity.
    conn_dist: float = 100000.0
    traj_scale: float = 1.0

    @nn.compact
    def __call__(self, pre_motion, valid, scene_ids=None, train: bool = False):
        # pre_motion: (T, N, 1) coefficient "positions"; valid: (N,).
        # scene_ids (optional, packed eval only): the reference evaluates one
        # scene per forward (utils/trainer.py:118), where its all-zeros
        # agent_mask means full attention *within that scene*. Packing several
        # scenes into one dispatch reproduces that exactly by masking
        # cross-scene attention; training omits scene_ids because the
        # reference's collated training really does attend across the whole
        # collated batch (agent_mask stays all-zeros there, model.py:530-534).
        t, n, _ = pre_motion.shape
        tf = self.future_frames

        def interleave_same_agent(lt, ls):
            a_t = jnp.arange(lt) % n
            a_s = jnp.arange(ls) % n
            return a_t[:, None] == a_s[None, :]

        key_bias = jnp.where(valid, 0.0, -1e9)                    # (N,)

        if self.conn_dist < 1000.0:
            cur = pre_motion[-1]                                   # (N, d)
            dist = jnp.linalg.norm(cur[:, None, :] - cur[None, :, :], axis=-1)
            agent_mask = jnp.where(dist > self.conn_dist / self.traj_scale,
                                   -jnp.inf, 0.0)                  # (N, N)
        else:
            agent_mask = jnp.zeros((n, n))
        if scene_ids is not None:
            cross_scene = scene_ids[:, None] != scene_ids[None, :]
            agent_mask = agent_mask + jnp.where(cross_scene, -1e9, 0.0)

        def pad_bias(lt, ls):
            # generate_mask (model.py:26-29): the (N, N) agent mask tiles over
            # the time blocks; padded key lanes are additionally masked.
            base = jnp.tile(agent_mask, (lt // n, ls // n))
            return base + jnp.tile(key_bias, ls // n)[None, :] * jnp.ones((lt, 1))

        # --- ContextEncoder (model.py:132-171) ---
        x = pre_motion.reshape(t * n, 1)
        x = TorchLinear(TF_MODEL_DIM, name="ctx_input_fc")(x)
        x = PosEncodeConcat(name="ctx_pos_encoder")(x, t, n, train)
        sa = interleave_same_agent(t * n, t * n)
        bias = pad_bias(t * n, t * n)
        for i in range(NLAYER_ENC):
            x = EncoderLayer(name=f"enc_layer_{i}")(x, sa, bias, train)
        context = x                                                # (T*N, E)

        # --- FutureDecoder.decode_traj_batch (model.py:316-401), collapsed to
        # one pass over `future_frames` repeated dec_in tokens (see module
        # docstring for the equivalence argument). ---
        dec_in = pre_motion[-1]                                    # (N, 1)
        dec_tokens = jnp.tile(dec_in, (tf, 1))                     # (tf*N, 1)
        y = TorchLinear(TF_MODEL_DIM, name="dec_input_fc")(dec_tokens)
        y = PosEncodeConcat(name="dec_pos_encoder")(y, tf, n, train)

        sa_tgt = interleave_same_agent(tf * n, tf * n)
        # generate_ar_mask (model.py:15-23): block-causal over time.
        t_idx = jnp.arange(tf * n) // n
        causal = jnp.where(t_idx[:, None] >= t_idx[None, :], 0.0, -jnp.inf)
        bias_tgt = causal + pad_bias(tf * n, tf * n)
        sa_mem = interleave_same_agent(tf * n, t * n)
        bias_mem = pad_bias(tf * n, t * n)
        for i in range(NLAYER_DEC):
            y = DecoderLayer(name=f"dec_layer_{i}")(
                y, context, sa_tgt, bias_tgt, sa_mem, bias_mem, train)

        # out_fc: normal(0, 0.01) weights, zero bias (utils/utils.py:212-222).
        w = self.param("out_fc_kernel",
                       nn.initializers.normal(0.01), (TF_MODEL_DIM, self.forecast_dim))
        b = self.param("out_fc_bias", nn.initializers.zeros, (self.forecast_dim,))
        seq_out = y @ w + b                                        # (tf*N, s)
        seq_out = seq_out.reshape(tf, n, self.forecast_dim)
        # dec_motion (pred_type 'pos', model.py:394-401): (N, tf, s)
        return jnp.transpose(seq_out, (1, 0, 2))


def make_model(cfg):
    bc = getattr(cfg, "baseline_config", None) or {}
    return AgentFormerLight(past_frames=cfg.k + 2, future_frames=cfg.k,
                            forecast_dim=cfg.num_samples,
                            conn_dist=float(bc.get("conn_dist", 100000.0)),
                            traj_scale=float(bc.get("traj_scale", 1.0)))


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (agentformer/bridge.py:6-13): pre_motion = [C_obs; ori] (T,N,1)."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)
    obs = jax.lax.stop_gradient(zero_invalid(obs, valid, 1))
    if aux.get("isolate_scenes", False):
        # Packed eval: restore the reference's per-scene attention scope.
        return (obs[:, :, None], valid, aux["scene_ids"])
    return (obs[:, :, None], valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (agentformer/bridge.py:23-26): (N, k, s) -> (k, N, s)."""
    return jnp.transpose(output_data, (1, 0, 2))


BATCHING = "collated"
# Packed-eval cap: attention spans every token in the dispatch, so the score
# matrices grow O((T*P)^2); keep eval packing at the training batch scale.
EVAL_PED_CAP = 128
