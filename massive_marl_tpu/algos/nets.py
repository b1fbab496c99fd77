"""Actor-critic networks (flax).

Mirrors the reference's MLP policies:
  * SARL `ActorCritic` (agents/algorithms/rl/ppo/module.py:8-107): ELU MLPs
    [1024,1024,512] (cfg/ppo/config.yaml:6-9), orthogonal init with stable-
    baselines gains (sqrt(2) hidden, 0.01 actor head, 1.0 critic head), and a
    state-independent log_std parameter.
  * The reference builds `MultivariateNormal(mean, scale_tril=diag(exp(log_std)^2))`
    (module.py:76-78) - i.e. the *square* of exp(log_std) is used as the std.
    We preserve that quirk (std = exp(log_std)^2) so that noise schedules and
    the adaptive-KL controller behave identically.

Dense layers run in bf16-friendly shapes (batch x 1024 etc.) and XLA maps the
matmuls straight onto the MXU.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_ACT = {
    "elu": nn.elu, "relu": nn.relu, "selu": nn.selu, "tanh": jnp.tanh,
    "lrelu": nn.leaky_relu, "sigmoid": nn.sigmoid,
}


def orthogonal_init(gain: float):
    return nn.initializers.orthogonal(scale=gain)


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    activation: str = "elu"
    out_gain: float = 0.01
    # bf16 compute on the hidden matmuls (MXU native); params stay f32 and
    # the output head runs in f32 so log-prob/KL math keeps full precision
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h, kernel_init=orthogonal_init(np.sqrt(2)),
                             dtype=self.compute_dtype)(x))
        x = x.astype(jnp.float32)
        return nn.Dense(self.out_dim, kernel_init=orthogonal_init(self.out_gain))(x)


class ActorCritic(nn.Module):
    """Shared-input actor + critic with state-independent log-std.

    `actor`/`critic` are exposed as separate apply methods so the rollout can
    run actor-only per step and batch ALL critic evaluations into one large
    forward after the rollout (same values, bigger matmuls, fewer launches).
    Submodule names keep the nn.compact param tree (MLP_0/MLP_1/log_std)."""
    act_dim: int
    hidden_actor: Sequence[int] = (1024, 1024, 512)
    hidden_critic: Sequence[int] = (1024, 1024, 512)
    activation: str = "elu"
    init_noise_std: float = 0.8  # cfg/ppo/config.yaml:31
    asymmetric: bool = False

    def setup(self):
        self._actor = MLP(self.hidden_actor, self.act_dim, self.activation, 0.01,
                          name="MLP_0")
        self._critic = MLP(self.hidden_critic, 1, self.activation, 1.0,
                           name="MLP_1")
        self._log_std = self.param("log_std",
                                   nn.initializers.constant(np.log(self.init_noise_std)),
                                   (self.act_dim,))

    def __call__(self, obs, states=None):
        mean = self._actor(obs)
        critic_in = states if (self.asymmetric and states is not None) else obs
        value = self._critic(critic_in)
        return mean, jnp.squeeze(value, -1), self._log_std

    def actor(self, obs):
        return self._actor(obs), self._log_std

    def critic(self, obs, states=None):
        critic_in = states if (self.asymmetric and states is not None) else obs
        return jnp.squeeze(self._critic(critic_in), -1)


def dist_std(log_std):
    """Reference quirk: scale_tril = diag(exp(log_std)^2) (module.py:76-78)."""
    return jnp.exp(log_std) ** 2


def gaussian_log_prob(mean, log_std, actions):
    std = dist_std(log_std)
    z = (actions - mean) / std
    return jnp.sum(-0.5 * z**2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def gaussian_entropy(log_std, batch_shape=()):
    std = dist_std(log_std)
    ent = jnp.sum(jnp.log(std) + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
    return jnp.broadcast_to(ent, batch_shape)


def gaussian_sample(key, mean, log_std):
    std = dist_std(log_std)
    return mean + std * jax.random.normal(key, mean.shape)


def gaussian_kl(mu_old, log_std_old, mu_new, log_std_new):
    """KL(old || new) per sample, matching the reference's adaptive-KL formula
    (ppo.py:277-283, written in terms of sigma = log-std parameters)."""
    return jnp.sum(
        log_std_new - log_std_old
        + (jnp.exp(log_std_old) ** 2 + (mu_old - mu_new) ** 2) / (2.0 * jnp.exp(log_std_new) ** 2)
        - 0.5,
        axis=-1,
    )
