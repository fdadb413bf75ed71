"""ET-LB-EBM: the LB-EBM predictor's `.predict()` path in ET coefficient space.

Rebuilt from the behaviour of baseline/lbebm/model.py used through `.predict()`
only (bridge.py:7): past-MLP + destination-MLP + predictor MLP. The EBM prior,
Langevin sampler, and replay memory (model.py:84-92, 159-188, 42-59) are never
executed in the ET pipeline (SURVEY §2b), so the live trainer path
(LBEBMPredict) instantiates only the predict-path submodules. The dormant
stochastic machinery is nonetheless provided for reference-component
completeness as LBEBMCVAE + ReplayMemory below (exercised only by
tests/test_dormant_stochastic.py): the EBM negative-energy head, the Langevin
prior sampler — a jax.grad-through-the-energy lax.fori_loop instead of the
reference's per-step torch.autograd.grad — and the CVAE train branch.

ET wiring (utils/trainer.py:406-427): enc_past (512,256), enc_dest (256,128),
predictor (1024,512,256), fdim=16, sub_goal_indexes=[11] so the destination is
2-D, past_length=k//2, future_length=k*s/2 so the predictor emits k*s values;
the scene origin doubles as the pseudo-destination (bridge.py:1-4).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchMLP, zero_invalid

ENC_PAST_SIZE = (512, 256)
ENC_DEST_SIZE = (256, 128)
PREDICTOR_SIZE = (1024, 512, 256)
FDIM = 16


class LBEBMPredict(nn.Module):
    """LBEBM.predict (lbebm/model.py:190-196)."""

    future_length: int
    fdim: int = FDIM

    @nn.compact
    def __call__(self, past, generated_dest, train: bool = False):
        ftraj = TorchMLP(ENC_PAST_SIZE, self.fdim, name="encoder_past")(past)
        dest_feat = TorchMLP(ENC_DEST_SIZE, self.fdim, name="encoder_dest")(generated_dest)
        feat = jnp.concatenate([ftraj, dest_feat], axis=1)
        return TorchMLP(PREDICTOR_SIZE, 2 * self.future_length, name="predictor")(feat)


# Dormant-path hyper-parameters (utils/trainer.py:406-422, lbebm_params).
# The non-local/zdim/sigma values coincide with pecnet's (optimal.yaml) but
# are deliberately NOT imported from models.pecnet: the reference sources
# them from its own lbebm_params dict, so the two configs can diverge
# upstream independently.
ENC_LATENT_SIZE = (256, 512)
DEC_SIZE = (1024, 512, 1024)
NON_LOCAL_THETA = (256, 128, 64)
NON_LOCAL_PHI = (256, 128, 64)
NON_LOCAL_G = (256, 128, 64)
NON_LOCAL_DIM = 128
NONLOCAL_POOLS = 3
ZDIM = 16
SIGMA = 1.3
NY = 1
E_PRIOR_SIG = 2.0
E_INIT_SIG = 2.0
E_L_STEPS = 20
E_L_STEP_SIZE = 0.4


class ReplayMemory:
    """Persistent-chain buffer for PCD (lbebm/model.py:42-59). Host-side
    training infrastructure: a ring buffer of past Langevin chains sampled
    uniformly to warm-start the next chain once the buffer is full."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.memory: list = []
        self.position = 0

    def push(self, z_row) -> None:
        import numpy as np

        if len(self.memory) < self.capacity:
            self.memory.append(None)
        self.memory[self.position] = np.asarray(z_row)
        self.position = (self.position + 1) % self.capacity

    def sample(self, rng, n: int = 100):
        import numpy as np

        idx = rng.choice(len(self.memory), size=n, replace=False)
        # Concatenate, not stack: the reference pushes z_e_k.split(1) rows of
        # shape (1, zdim) and returns torch.cat(samples) -> (n, zdim)
        # (lbebm/model.py:53-54); stacking would add a bogus middle axis.
        return np.concatenate([self.memory[i] for i in idx], axis=0)

    def __len__(self) -> int:
        return len(self.memory)


class LBEBMCVAE(nn.Module):
    """Full LBEBM forward (lbebm/model.py:95-152) — DORMANT in the ET
    pipeline (the bridge drives only predict()); provided for component
    completeness and pinned against the reference by tests.

    train=True mirrors the reference's training branch: z_e is drawn from
    the EBM prior by Langevin dynamics starting at `z_e_0` (the caller owns
    the PCD ReplayMemory and passes either a fresh sample_p_0 draw or a
    replayed chain), z_g is reparameterized from the CVAE posterior, and the
    output is (generated_dest, mu, logvar, pred_future, cd, en_pos, en_neg).
    train=False runs Langevin from a fresh init and decodes the endpoint.
    The reference only ever calls forward with mask=None in the ET wiring,
    but the optional social pooling over ftraj (model.py:101-103) is kept.
    """

    future_length: int
    fdim: int = FDIM
    zdim: int = ZDIM
    # Unused, mirroring the reference: LBEBM.__init__ stores sigma
    # (model.py:63-67) but eval draws come from the Langevin chain, so the
    # field never affects behavior there either.
    sigma: float = SIGMA

    def _ebm_energy(self, params_ebm, z, cond):
        """-logsumexp of the EBM head (model.py:154-162), as a pure function
        of z so the Langevin update can jax.grad through it."""
        x = jnp.concatenate([z, jax.lax.stop_gradient(cond)], axis=1)
        for i, name in enumerate(("layers_0", "layers_1", "layers_2")):
            x = x @ params_ebm[name]["kernel"] + params_ebm[name]["bias"]
            if i < 2:
                x = jax.nn.gelu(x, approximate=False)
        return -jax.nn.logsumexp(x, axis=1)

    def sample_langevin_prior_z(self, params_ebm, z0, cond, rng=None,
                                with_noise: bool = True):
        """Langevin dynamics under energy + Gaussian prior (model.py:164-188):
        z <- z - 0.5*s^2*(dE/dz + z/sig^2) [+ s*eps]. A lax.fori_loop with
        jax.grad replaces the reference's Python loop of autograd.grad calls."""
        grad_e = jax.grad(
            lambda z: self._ebm_energy(params_ebm, z, cond).sum())
        s = E_L_STEP_SIZE

        def body(i, z):
            g = grad_e(z) + z / (E_PRIOR_SIG ** 2)
            z = z - 0.5 * s * s * g
            if with_noise:
                z = z + s * jax.random.normal(
                    jax.random.fold_in(rng, i), z.shape)
            return z

        return jax.lax.fori_loop(0, E_L_STEPS, body, z0)

    @nn.compact
    def __call__(self, past, dest=None, mask=None, z_e_0=None, eps=None,
                 rng=None, train: bool = False, langevin_noise: bool = True):
        encoder_past = TorchMLP(ENC_PAST_SIZE, self.fdim, name="encoder_past")
        encoder_dest = TorchMLP(ENC_DEST_SIZE, self.fdim, name="encoder_dest")
        decoder = TorchMLP(DEC_SIZE, 2, name="decoder")
        # The EBM head is a plain Linear/GELU stack (model.py:84-92); named
        # layers_{0,2,4} in torch's Sequential -> layers_{0,1,2} here.
        params_ebm = {
            name: {"kernel": self.param(f"EBM_{name}_kernel",
                                        nn.initializers.lecun_normal(), shape),
                   "bias": self.param(f"EBM_{name}_bias",
                                      nn.initializers.zeros, (shape[1],))}
            for name, shape in (("layers_0", (self.zdim + self.fdim, 200)),
                                ("layers_1", (200, 200)),
                                ("layers_2", (200, NY)))}

        ftraj = encoder_past(past)
        if mask is not None:
            theta = TorchMLP(NON_LOCAL_THETA, NON_LOCAL_DIM,
                             name="non_local_theta")
            phi = TorchMLP(NON_LOCAL_PHI, NON_LOCAL_DIM, name="non_local_phi")
            g = TorchMLP(NON_LOCAL_G, self.fdim, name="non_local_g")
            from .pecnet import _social_pool

            for _ in range(NONLOCAL_POOLS):
                ftraj = _social_pool(theta, phi, g, ftraj, mask)

        if rng is None and (z_e_0 is None or langevin_noise
                            or (train and eps is None)):
            rng = self.make_rng("latent")
        if z_e_0 is None:
            rng, k0 = jax.random.split(rng)
            z_e_0 = E_INIT_SIG * jax.random.normal(
                k0, (past.shape[0], self.zdim))  # sample_p_0 (model.py:164)
        kl = None
        if rng is not None:
            rng, kl = jax.random.split(rng)
        z_e_k = jax.lax.stop_gradient(
            self.sample_langevin_prior_z(
                jax.lax.stop_gradient(params_ebm), z_e_0, ftraj, rng=kl,
                with_noise=langevin_noise))

        if not train:
            return decoder(jnp.concatenate([ftraj, z_e_k], axis=1))

        latent = TorchMLP(ENC_LATENT_SIZE, 2 * self.zdim,
                          name="encoder_latent")(
            jnp.concatenate([ftraj, encoder_dest(dest)], axis=1))
        mu, logvar = latent[:, :self.zdim], latent[:, self.zdim:]
        if eps is None:
            rng, ke = jax.random.split(rng)
            eps = jax.random.normal(ke, mu.shape)
        z_g_k = eps * jnp.exp(0.5 * logvar) + mu

        generated_dest = decoder(jnp.concatenate([ftraj, z_g_k], axis=1))
        feat = jnp.concatenate([ftraj, encoder_dest(generated_dest)], axis=1)
        pred_future = TorchMLP(PREDICTOR_SIZE, 2 * self.future_length,
                               name="predictor")(feat)

        en_pos = self._ebm_energy(params_ebm, z_g_k, ftraj).mean()
        en_neg = self._ebm_energy(
            params_ebm, jax.lax.stop_gradient(z_e_k), ftraj).mean()
        return (generated_dest, mu, logvar, pred_future,
                en_pos - en_neg, en_pos, en_neg)


def make_model(cfg):
    return LBEBMPredict(future_length=cfg.k * cfg.num_samples // 2)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (lbebm/bridge.py:1-4): (C_obs^T, ori^T)."""
    valid = aux["ped_valid"]
    past = jax.lax.stop_gradient(zero_invalid(c_obs, valid, 1)).T   # (N, k)
    ori = jax.lax.stop_gradient(zero_invalid(obs_ori, valid, 1)).T  # (N, 2)
    return (past, ori)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (lbebm/bridge.py:12-17): (N, k*s) -> (k, N, s)."""
    n, nk = output_data.shape
    s = aux["num_samples"]
    return jnp.transpose(output_data.reshape(n, nk // s, s), (1, 0, 2))


BATCHING = "collated"
