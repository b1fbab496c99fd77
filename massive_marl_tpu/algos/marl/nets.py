"""MARL actor/critic networks.

Mirrors the reference on-policy MARL nets
(agents/algorithms/marl/actor_critic.py:11-168 + utils/mlp.py:7-66 +
utils/distributions.py:94-117):
  * MLPBase: LayerNorm feature normalization, then (1 + layer_N) blocks of
    Linear -> ELU -> LayerNorm, hidden 512 (cfg/happo/config.yaml)
  * DiagGaussian head: orthogonal(0.01) mean layer and a state-independent
    parameter with std = sigmoid(p / std_x_coef) * std_y_coef (init p =
    std_x_coef -> std ~ 0.366)
  * Critic: same base, linear value head

The agent axis is handled OUTSIDE by stacking parameters [N, ...] and
vmapping `apply` - the TPU-native form of the reference's per-agent module
lists (SURVEY.md section 3.2 note on the vmap opportunity).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from massive_marl_tpu.algos.nets import orthogonal_init


class MLPBase(nn.Module):
    hidden_size: int = 512
    layer_n: int = 2
    use_feature_normalization: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_feature_normalization:
            x = nn.LayerNorm()(x)
        gain = np.sqrt(2)  # relu gain (mlp.py:14)
        for _ in range(1 + self.layer_n):
            # the activation stream stays bf16 end-to-end: matmuls hit the
            # MXU natively and every [batch, hidden] HBM round-trip is half
            # the f32 traffic (the learner phase is HBM-bound at MARL batch
            # sizes).  LayerNorm still computes its statistics in f32 -
            # flax upcasts internally - and params stay f32.
            x = nn.Dense(self.hidden_size, kernel_init=orthogonal_init(gain),
                         dtype=jnp.bfloat16)(x)
            x = nn.elu(x)
            x = nn.LayerNorm(dtype=jnp.bfloat16)(x)
        return x


class MarlActor(nn.Module):
    act_dim: int
    hidden_size: int = 512
    layer_n: int = 2
    gain: float = 0.01
    std_x_coef: float = 1.0
    std_y_coef: float = 0.5

    @nn.compact
    def __call__(self, obs):
        h = MLPBase(self.hidden_size, self.layer_n)(obs)
        mean = nn.Dense(self.act_dim, kernel_init=orthogonal_init(self.gain))(h)
        std_param = self.param("std_param", nn.initializers.constant(self.std_x_coef),
                               (self.act_dim,))
        std = jax.nn.sigmoid(std_param / self.std_x_coef) * self.std_y_coef
        return mean, jnp.broadcast_to(std, mean.shape)


class MarlCritic(nn.Module):
    hidden_size: int = 512
    layer_n: int = 2

    @nn.compact
    def __call__(self, x):
        h = MLPBase(self.hidden_size, self.layer_n)(x)
        v = nn.Dense(1, kernel_init=orthogonal_init(np.sqrt(2)))(h)
        return jnp.squeeze(v, -1)


def normal_log_prob(mean, std, actions):
    z = (actions - mean) / std
    return jnp.sum(-0.5 * z**2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def normal_entropy(std):
    return jnp.sum(jnp.log(std) + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def huber(err, delta):
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * err**2, delta * (a - 0.5 * delta))


# ---------------------------------------------------------------------------
# running value normalizer (reference PopArt/ValueNorm,
# marl/utils/popart.py:8-76: debiased running mean/mean-sq, var clamped 1e-2)
# ---------------------------------------------------------------------------

from flax import struct


@struct.dataclass
class ValueNorm:
    mean: jnp.ndarray
    mean_sq: jnp.ndarray
    debias: jnp.ndarray
    beta: float = struct.field(pytree_node=False, default=0.99999)

    @classmethod
    def create(cls, beta: float = 0.99999):
        return cls(mean=jnp.zeros(()), mean_sq=jnp.zeros(()), debias=jnp.zeros(()), beta=beta)

    def stats(self):
        m = self.mean / jnp.maximum(self.debias, 1e-5)
        msq = self.mean_sq / jnp.maximum(self.debias, 1e-5)
        var = jnp.maximum(msq - m**2, 1e-2)
        return m, var

    def update(self, batch, axis_name: str | None = None):
        """axis_name: mesh axis to pmean the batch statistics over when the
        batch is sharded (multi-chip update under shard_map)."""
        m, msq = batch.mean(), (batch**2).mean()
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
            msq = jax.lax.pmean(msq, axis_name)
        w = self.beta
        return self.replace(
            mean=self.mean * w + m * (1 - w),
            mean_sq=self.mean_sq * w + msq * (1 - w),
            debias=self.debias * w + (1 - w),
        )

    def normalize(self, x):
        m, var = self.stats()
        return (x - m) / jnp.sqrt(var)

    def denormalize(self, x):
        m, var = self.stats()
        return x * jnp.sqrt(var) + m


def norm_targets(vn: "ValueNorm", ret, mode: str, axis_name: str | None = None):
    """Stats update + normalized value targets with the exact per-loss-call
    cadence of the reference trainers.  Returns (vn', rn_clipped, rn_original).

    mode='popart': the reference PopArt is a running normalizer whose
      `forward(train=True)` updates the stats on EVERY call (popart.py:35-61;
      despite the name it never rescales the critic output layer - the only
      marl/actor_critic.py `v_out` is a plain Linear, and the one popart
      branch that points at it, ippo_trainer.py:55-56, is dead because
      cfg/ippo sets use_popart False).  cal_value_loss calls it twice
      (happo_trainer.py:62-63): error_clipped sees the stats after the first
      update, error_original after the second.
    mode='valuenorm': one update(), both errors share the stats
      (mappo_trainer.py:74-78).
    mode='none': raw returns pass through.
    """
    if mode == "popart":
        vn1 = vn.update(ret, axis_name)
        rn_c = vn1.normalize(ret)
        vn2 = vn1.update(ret, axis_name)
        return vn2, rn_c, vn2.normalize(ret)
    if mode == "valuenorm":
        vn = vn.update(ret, axis_name)
        rn = vn.normalize(ret)
        return vn, rn, rn
    return vn, ret, ret


class MarlActorRNN(nn.Module):
    """Recurrent actor: MLPBase -> GRU -> DiagGaussian (the reference's
    optional RNNLayer path, actor_critic.py:35-36 + utils/rnn.py; hidden
    state is zeroed where mask==0, i.e. at episode boundaries)."""
    act_dim: int
    hidden_size: int = 512
    layer_n: int = 2
    gain: float = 0.01
    std_x_coef: float = 1.0
    std_y_coef: float = 0.5

    @nn.compact
    def __call__(self, obs, h, mask):
        """obs [...,obs_dim], h [...,H], mask [...] (1 = continue)."""
        x = MLPBase(self.hidden_size, self.layer_n)(obs)
        h = h * mask[..., None]
        h, out = nn.GRUCell(features=self.hidden_size)(h, x)
        mean = nn.Dense(self.act_dim, kernel_init=orthogonal_init(self.gain))(out)
        std_param = self.param("std_param", nn.initializers.constant(self.std_x_coef),
                               (self.act_dim,))
        std = jax.nn.sigmoid(std_param / self.std_x_coef) * self.std_y_coef
        return mean, jnp.broadcast_to(std, mean.shape), h


class MarlCriticRNN(nn.Module):
    hidden_size: int = 512
    layer_n: int = 2

    @nn.compact
    def __call__(self, x, h, mask):
        feat = MLPBase(self.hidden_size, self.layer_n)(x)
        h = h * mask[..., None]
        h, out = nn.GRUCell(features=self.hidden_size)(h, feat)
        v = nn.Dense(1, kernel_init=orthogonal_init(np.sqrt(2)))(out)
        return jnp.squeeze(v, -1), h
