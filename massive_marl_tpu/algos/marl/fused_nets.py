"""Agent-stacked MarlActor/MarlCritic forwards on the fused Pallas MLP block
(ops/fused_mlp.py).

Used by the MARL update phase (runner.py), where batches are naturally
[N_agents, B, ...]: the agent axis becomes a kernel grid dimension instead
of a vmap, and each Dense->ELU->LayerNorm block runs as one fused kernel
(see ops/fused_mlp.py docstring for the bandwidth analysis).  Parameter
trees are the ordinary jax.vmap-initialized flax variables - every leaf has
a leading N axis - so checkpoints and the flax path stay interchangeable.

Gradients flow through a custom VJP (reverse-mode only).  HATRPO's
Fisher-vector products use `actor_linearize` below - the fused primal
forward and tangent-constant operands computed once, returning a MANUAL
directional-tangent closure (plain XLA from the saved activations) that the
CG loop evaluates repeatedly, composed with the custom-VJP pullback via the
Gauss-Newton identity F v = J^T M (J v) (runner.py trpo_actor_update).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from massive_marl_tpu.ops.fused_mlp import (
    mlp_base_stacked, mlp_base_stacked_jvp, mlp_base_stacked_linearize,
    mlp_base_stacked_tangent)


def actor_apply(variables: dict, obs: jnp.ndarray, *,
                std_x_coef: float = 1.0, std_y_coef: float = 0.5,
                layer_n: int = 2, prenormed: bool = False,
                interpret: bool | None = None):
    """MarlActor.apply, agent-stacked: obs [N,B,obs_dim] -> (mean, std) [N,B,act].

    Mirrors algos/marl/nets.py MarlActor (MLPBase -> Dense head + sigmoid
    std), matching the reference actor (marl/actor_critic.py:11-99 +
    distributions.py:94-117).
    """
    p = variables["params"]
    h = mlp_base_stacked(p["MLPBase_0"], obs, layer_n=layer_n,
                         prenormed=prenormed, interpret=interpret)
    head = p["Dense_0"]
    mean = jnp.einsum("nbh,nho->nbo", h.astype(jnp.float32), head["kernel"]) \
        + head["bias"][:, None, :]
    std = jax.nn.sigmoid(p["std_param"] / std_x_coef) * std_y_coef  # [N, act]
    return mean, jnp.broadcast_to(std[:, None, :], mean.shape)


def actor_linearize(variables: dict, obs: jnp.ndarray, *,
                    std_x_coef: float = 1.0, std_y_coef: float = 0.5,
                    layer_n: int = 2, prenormed: bool = False,
                    interpret: bool | None = None):
    """actor_apply + a reusable parameter-directional tangent closure.

    Returns (mean, std, tangent) where tangent(dvariables) -> (dmean, dstd).
    The fused primal forward and every tangent-constant operand are computed
    ONCE; HATRPO's CG solve evaluates the tangent ~11 times at the same
    linearization point (runner.py trpo_actor_update), so hoisting this out
    of the Fisher-vector product removes the repeated fused forwards that
    dominated the r2 HATRPO profile (BASELINE.md)."""
    p = variables["params"]
    h, saved = mlp_base_stacked_linearize(p["MLPBase_0"], obs,
                                          layer_n=layer_n, prenormed=prenormed,
                                          interpret=interpret)
    head = p["Dense_0"]
    hf = h.astype(jnp.float32)
    mean = jnp.einsum("nbh,nho->nbo", hf, head["kernel"]) + head["bias"][:, None, :]
    s = jax.nn.sigmoid(p["std_param"] / std_x_coef)
    std = s * std_y_coef
    std_b = jnp.broadcast_to(std[:, None, :], mean.shape)

    def tangent(dvariables: dict):
        dp = dvariables["params"]
        dh = mlp_base_stacked_tangent(dp["MLPBase_0"], saved,
                                      layer_n=layer_n)
        dhead = dp["Dense_0"]
        dmean = jnp.einsum("nbh,nho->nbo", dh, head["kernel"]) \
            + jnp.einsum("nbh,nho->nbo", hf, dhead["kernel"]) \
            + dhead["bias"][:, None, :]
        dstd = s * (1.0 - s) * dp["std_param"] / std_x_coef * std_y_coef
        return dmean, jnp.broadcast_to(dstd[:, None, :], dmean.shape)

    return mean, std_b, tangent


def actor_apply_jvp(variables: dict, dvariables: dict, obs: jnp.ndarray, *,
                    std_x_coef: float = 1.0, std_y_coef: float = 0.5,
                    layer_n: int = 2, prenormed: bool = False,
                    interpret: bool | None = None):
    """actor_apply + its parameter-directional tangent (manual JVP).

    One-shot composition of actor_linearize + tangent (kept for the
    equivalence tests); returns (mean, std, dmean, dstd) - the obs tangent
    is zero.  No AD registration: runner.py's trpo_actor_update composes
    this with the custom-VJP pullback into a Gauss-Newton Fisher-vector
    product."""
    mean, std_b, tangent = actor_linearize(
        variables, obs, std_x_coef=std_x_coef, std_y_coef=std_y_coef,
        layer_n=layer_n, prenormed=prenormed, interpret=interpret)
    dmean, dstd_b = tangent(dvariables)
    return mean, std_b, dmean, dstd_b


def critic_apply(variables: dict, x: jnp.ndarray, *, layer_n: int = 2,
                 prenormed: bool = False,
                 interpret: bool | None = None) -> jnp.ndarray:
    """MarlCritic.apply, agent-stacked: x [N,B,in_dim] -> values [N,B]."""
    p = variables["params"]
    h = mlp_base_stacked(p["MLPBase_0"], x, layer_n=layer_n,
                         prenormed=prenormed, interpret=interpret)
    head = p["Dense_0"]
    v = jnp.einsum("nbh,nho->nbo", h.astype(jnp.float32), head["kernel"]) \
        + head["bias"][:, None, :]
    return jnp.squeeze(v, -1)
