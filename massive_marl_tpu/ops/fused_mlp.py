"""Pallas TPU kernel: fused Dense -> ELU -> LayerNorm block, fwd + bwd.

Why: the MARL learner (10 agents x 5 epochs of full-batch PPO updates,
agents/algorithms/marl/{mappo,happo}_trainer.py semantics) is HBM-bandwidth
bound on TPU - measured 19.3 ms per vmapped tower grad step where the pure
matmuls cost ~8 ms (scripts/profile_batched_mm.py, BASELINE.md "Roofline
verdict").  XLA materialises the pre-activation AND the LayerNorm output per
layer and re-reads both in the backward pass.  This kernel:

  * computes h = x@W + b, a = elu(h), y = LN(a)*gamma + beta in ONE pass
    (f32 accumulation/statistics in VMEM, bf16 in HBM),
  * saves a single bf16 residual per layer (`a`; mu/sigma and elu'(h) are
    recomputed from it in-kernel: elu' = where(a>0, 1, a+1)),
  * fuses the whole backward chain (dgamma/dbeta/db reductions, LN backward,
    elu backward, dW and dx matmuls) into one pass with per-agent grad
    accumulation across row blocks (TPU grids iterate sequentially, so
    `i==0 ? init : accumulate` on a revisited output block is safe).

Shapes are agent-stacked: x [N, B, Din], W [N, Din, H] - the agent axis is a
grid dimension, not a vmap, so the kernel sees plain 2-D tiles.  Din and H
must be multiples of 128 (callers pad; zero-padded columns of x / rows of W
contribute exactly zero).  B must divide by the row block.

Numerical equivalence with the flax MLPBase block (algos/marl/nets.py) is
tested in tests/test_fused_mlp.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6  # flax.linen.LayerNorm default epsilon


def _auto_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, b_ref, g_ref, be_ref, g0_ref, b0_ref, y_ref, a_ref):
    # input affine prologue: x is the PRE-NORMALIZED feature stream (the
    # feature-LayerNorm statistics are parameter-free, so callers compute
    # (x-mu)/sigma once per update); gamma0/beta0 are that LN's learnables
    x = (x_ref[0].astype(jnp.float32) * g0_ref[0].astype(jnp.float32)
         + b0_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    w = w_ref[0]                                   # [Din, H] bf16 stream
    h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b_ref[0].astype(jnp.float32)
    # elu in f32 (expm1 has no Pallas TPU lowering; exp-1 in f32 is fine -
    # the bf16 residual rounding dominates)
    a = jnp.where(h > 0, h, jnp.exp(h) - 1.0)
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    yhat = (a - mu) * inv
    y = yhat * g_ref[0].astype(jnp.float32) + be_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    a_ref[0] = a.astype(a_ref.dtype)


def _bwd_kernel(dy_ref, a_ref, x_ref, w_ref, g_ref, g0_ref, b0_ref,
                dx_ref, dw_ref, db_ref, dg_ref, dbe_ref, dg0_ref, db0_ref):
    i = pl.program_id(1)                           # row-block index (minor)
    dy = dy_ref[0].astype(jnp.float32)             # [BM, H]
    a = a_ref[0].astype(jnp.float32)
    xhat = x_ref[0]                                # [BM, Din] bf16 (pre-norm)
    g0 = g0_ref[0].astype(jnp.float32)
    x = (xhat.astype(jnp.float32) * g0
         + b0_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    w = w_ref[0]                                   # [Din, H] bf16 stream

    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    yhat = (a - mu) * inv

    g = g_ref[0].astype(jnp.float32)
    dyh = dy * g
    m1 = jnp.mean(dyh, axis=-1, keepdims=True)
    m2 = jnp.mean(dyh * yhat, axis=-1, keepdims=True)
    da = (dyh - m1 - yhat * m2) * inv
    dh = da * jnp.where(a > 0, 1.0, a + 1.0)       # elu'(h) from a
    dh16 = dh.astype(jnp.bfloat16)

    dx_raw = jax.lax.dot_general(
        dh16, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [BM, Din] f32, wrt x
    dx_ref[0] = (dx_raw * g0).astype(dx_ref.dtype)  # wrt xhat

    dw_blk = jax.lax.dot_general(
        x, dh16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Din, H] f32
    db_blk = jnp.sum(dh, axis=0, keepdims=True)
    dg_blk = jnp.sum(dy * yhat, axis=0, keepdims=True)
    dbe_blk = jnp.sum(dy, axis=0, keepdims=True)
    dg0_blk = jnp.sum(dx_raw * xhat.astype(jnp.float32), axis=0, keepdims=True)
    db0_blk = jnp.sum(dx_raw, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dw_ref[0] = dw_blk
        db_ref[0] = db_blk
        dg_ref[0] = dg_blk
        dbe_ref[0] = dbe_blk
        dg0_ref[0] = dg0_blk
        db0_ref[0] = db0_blk

    @pl.when(i > 0)
    def _acc():
        dw_ref[0] += dw_blk
        db_ref[0] += db_blk
        dg_ref[0] += dg_blk
        dbe_ref[0] += dbe_blk
        dg0_ref[0] += dg0_blk
        db0_ref[0] += db0_blk


# ---------------------------------------------------------------------------
# custom-vjp op
# ---------------------------------------------------------------------------

def _pick_bm(B: int) -> int:
    import os
    forced = int(os.environ.get("FUSED_MLP_BM", "0"))  # perf-sweep knob
    if forced and B % forced == 0:
        return forced
    # swept on v5e at MAPPO bench shapes: 1024 = 196.4k, 512 = 190.5k,
    # 256 = 174.7k env-steps/s; 2048 exceeds VMEM
    for bm in (1024, 512, 256, 128, 64, 32, 16, 8):
        if B % bm == 0:
            return bm
    return 0


def _fwd_call(x, w, b, g, be, g0, b0, bm: int, interpret: bool):
    N, B, Din = x.shape
    H = w.shape[-1]
    grid = (N, B // bm)
    # stream the weights bf16 (cast once here, NOT per grid step): the f32
    # master stays the custom-vjp primal so dW comes back f32 for adam
    w = w.astype(jnp.bfloat16)
    y, a = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, Din), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Din, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Din), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Din), lambda n, i: (n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, H), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, bm, H), lambda n, i: (n, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((N, B, H), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, w, b[:, None, :], g[:, None, :], be[:, None, :],
      g0[:, None, :], b0[:, None, :])
    return y, a


def _bwd_call(dy, a, x, w, g, g0, b0, bm: int, interpret: bool):
    N, B, Din = x.shape
    H = w.shape[-1]
    grid = (N, B // bm)
    w = w.astype(jnp.bfloat16)
    dx, dw, db, dg, dbe, dg0, db0 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, H), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, bm, H), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, bm, Din), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Din, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Din), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Din), lambda n, i: (n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, Din), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Din, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Din), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Din), lambda n, i: (n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, Din), jnp.bfloat16),
            jax.ShapeDtypeStruct((N, Din, H), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, Din), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, Din), jnp.float32),
        ],
        interpret=interpret,
    )(dy, a, x, w, g[:, None, :], g0[:, None, :], b0[:, None, :])
    return (dx, dw, db[:, 0, :], dg[:, 0, :], dbe[:, 0, :],
            dg0[:, 0, :], db0[:, 0, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def dense_elu_ln(x, w, b, gamma, beta, gamma0, beta0, bm: int, interpret: bool):
    """y = LayerNorm(elu((x*gamma0 + beta0) @ w + b)) * gamma + beta, stacked.

    x [N,B,Din] bf16 - for the FIRST layer this is the pre-normalized
    feature stream ((x-mu)/sigma of the feature LayerNorm, parameter-free,
    computed once per update) and gamma0/beta0 [N,Din] are that LN's
    learnables; for hidden layers pass ones/zeros.  w [N,Din,H] f32 master
    weights (cast to bf16 in-kernel so dW comes back f32 for the optimizer);
    b/gamma/beta [N,H] f32.  Din, H multiples of 128; B % bm == 0.
    Returns y [N,B,H] bf16.
    """
    y, _ = _fwd_call(x, w, b, gamma, beta, gamma0, beta0, bm, interpret)
    return y


def _vjp_fwd(x, w, b, gamma, beta, gamma0, beta0, bm, interpret):
    y, a = _fwd_call(x, w, b, gamma, beta, gamma0, beta0, bm, interpret)
    return y, (x, w, gamma, gamma0, beta0, a)


def _vjp_bwd(bm, interpret, res, dy):
    x, w, gamma, gamma0, beta0, a = res
    dx, dw, db, dg, dbe, dg0, db0 = _bwd_call(
        dy.astype(jnp.bfloat16), a, x, w, gamma, gamma0, beta0, bm, interpret)
    return dx, dw, db, dg, dbe, dg0, db0


dense_elu_ln.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# MLPBase-equivalent stacked apply
# ---------------------------------------------------------------------------

def _pad_features(x, mult: int = 128):
    d = x.shape[-1]
    pad = (-d) % mult
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def feature_norm(x: jnp.ndarray) -> jnp.ndarray:
    """The parameter-free part of the feature LayerNorm: (x-mu)/sigma over
    the last axis, padded to a 128 multiple and cast bf16.  Hoist this OUT of
    the epoch loop (the input never changes across epochs); the LN's
    learnable gamma/beta are applied inside the first fused layer."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xh = (x - mu) * jax.lax.rsqrt(var + _EPS)
    return _pad_features(xh).astype(jnp.bfloat16)


def mlp_base_stacked(params: dict, x: jnp.ndarray, layer_n: int = 2,
                     use_feature_normalization: bool = True,
                     prenormed: bool = False,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Agent-stacked MLPBase forward via the fused kernels.

    params: the 'MLPBase_0' subtree of a jax.vmap-initialized MarlActor/
    MarlCritic variables dict - every leaf carries a leading agent axis N.
    x: [N, B, obs_dim] f32, or the output of `feature_norm` when
    prenormed=True.  Returns [N, B, H] bf16 (same stream dtype as the flax
    path).  Raises ValueError if B has no valid row block; callers keep the
    flax path for such shapes.
    """
    if interpret is None:
        interpret = _auto_interpret()
    N, B, _ = x.shape
    bm = _pick_bm(B)
    if bm == 0:
        raise ValueError(f"B={B} has no supported row block")

    if use_feature_normalization and not prenormed:
        x = feature_norm(x)
        prenormed = True
    h = x if prenormed else _pad_features(x).astype(jnp.bfloat16)

    for li in range(1 + layer_n):
        w = params[f"Dense_{li}"]["kernel"]
        w = jnp.pad(w, [(0, 0), (0, (-w.shape[1]) % 128), (0, 0)]) \
            if w.shape[1] % 128 else w
        ln = params[f"LayerNorm_{li + 1}"] if use_feature_normalization \
            else params[f"LayerNorm_{li}"]
        din = w.shape[1]
        if li == 0 and use_feature_normalization:
            ln0 = params["LayerNorm_0"]
            pad = din - ln0["scale"].shape[-1]
            g0 = jnp.pad(ln0["scale"], [(0, 0), (0, pad)])
            b0 = jnp.pad(ln0["bias"], [(0, 0), (0, pad)])
        else:
            g0 = jnp.ones((N, din), jnp.float32)
            b0 = jnp.zeros((N, din), jnp.float32)
        h = dense_elu_ln(h, w, params[f"Dense_{li}"]["bias"],
                         ln["scale"], ln["bias"], g0, b0, bm, interpret)
    return h
