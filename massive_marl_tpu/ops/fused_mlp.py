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
# whole-tower fusion: all L layers of the MLPBase in ONE kernel
# ---------------------------------------------------------------------------
#
# The per-layer kernel above still pays HBM for every inter-layer boundary
# (write y_l, read it back as x_{l+1}) and for the per-layer residuals
# (write a_l in fwd, read it in bwd).  For the 3-layer 512-hidden tower at
# B=327,680 that is ~4.7 GB of avoidable traffic per grad step.  The tower
# kernels below keep the whole layer chain in VMEM per row block:
#   * fwd writes ONLY the final y - no residuals at all,
#   * bwd RECOMPUTES the forward in-register (activations stay f32 in VMEM,
#     strictly more accurate than the bf16 residuals of the per-layer path)
#     and runs the full backward chain, accumulating per-agent weight grads
#     across row blocks,
#   * dx is optional (need_dx=False): PPO updates never differentiate w.r.t.
#     observations, so the [B,Din] dx write and its dh@W^T matmul for layer 0
#     are skipped (layer 0 still computes dx_raw when the feature-LN needs
#     dgamma0/dbeta0).


def _tower_fwd_kernel(L: int):
    def kernel(*refs):
        x_ref, g0_ref, b0_ref = refs[0:3]
        ws = refs[3:3 + L]
        bs = refs[3 + L:3 + 2 * L]
        gs = refs[3 + 2 * L:3 + 3 * L]
        bes = refs[3 + 3 * L:3 + 4 * L]
        y_ref = refs[3 + 4 * L]
        h = (x_ref[0].astype(jnp.float32) * g0_ref[0].astype(jnp.float32)
             + b0_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
        for l in range(L):
            hp = jnp.dot(h, ws[l][0], preferred_element_type=jnp.float32) \
                + bs[l][0].astype(jnp.float32)
            a = jnp.where(hp > 0, hp, jnp.exp(hp) - 1.0)
            mu = jnp.mean(a, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
            yhat = (a - mu) * jax.lax.rsqrt(var + _EPS)
            y = yhat * gs[l][0].astype(jnp.float32) + bes[l][0].astype(jnp.float32)
            h = y.astype(jnp.bfloat16)
        y_ref[0] = h
    return kernel


def _tower_bwd_kernel(L: int, need_dx: bool):
    def kernel(*refs):
        dy_ref, x_ref, g0_ref, b0_ref = refs[0:4]
        ws = refs[4:4 + L]
        bs = refs[4 + L:4 + 2 * L]
        gs = refs[4 + 2 * L:4 + 3 * L]
        bes = refs[4 + 3 * L:4 + 4 * L]
        o = 4 + 4 * L
        dx_ref = refs[o] if need_dx else None
        o += 1 if need_dx else 0
        dw_refs = refs[o:o + L]
        db_refs = refs[o + L:o + 2 * L]
        dg_refs = refs[o + 2 * L:o + 3 * L]
        dbe_refs = refs[o + 3 * L:o + 4 * L]
        dg0_ref, db0_ref = refs[o + 4 * L:o + 4 * L + 2]

        i = pl.program_id(1)
        xhat = x_ref[0]                               # [BM, Din] bf16 pre-norm
        g0 = g0_ref[0].astype(jnp.float32)
        x0 = (xhat.astype(jnp.float32) * g0
              + b0_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

        # forward recompute, keeping per-layer inputs + activations bf16 in
        # VMEM (halves the live set vs f32; matches the per-layer kernel's
        # bf16-residual rounding)
        xs, acts = [x0], []
        h = x0
        for l in range(L):
            hp = jnp.dot(h, ws[l][0], preferred_element_type=jnp.float32) \
                + bs[l][0].astype(jnp.float32)
            a = jnp.where(hp > 0, hp, jnp.exp(hp) - 1.0)
            acts.append(a.astype(jnp.bfloat16))
            if l < L - 1:  # last layer's LN output is never needed in bwd
                mu = jnp.mean(a, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
                yhat = (a - mu) * jax.lax.rsqrt(var + _EPS)
                y = yhat * gs[l][0].astype(jnp.float32) \
                    + bes[l][0].astype(jnp.float32)
                h = y.astype(jnp.bfloat16)
                xs.append(h)

        # backward chain, all in VMEM
        dy = dy_ref[0].astype(jnp.float32)
        dx_raw = None
        for l in reversed(range(L)):
            a = acts[l].astype(jnp.float32)
            mu = jnp.mean(a, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(a - mu), axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(var + _EPS)
            yhat = (a - mu) * inv
            g = gs[l][0].astype(jnp.float32)
            dyh = dy * g
            m1 = jnp.mean(dyh, axis=-1, keepdims=True)
            m2 = jnp.mean(dyh * yhat, axis=-1, keepdims=True)
            da = (dyh - m1 - yhat * m2) * inv
            dh = da * jnp.where(a > 0, 1.0, a + 1.0)
            dh16 = dh.astype(jnp.bfloat16)

            dw_blk = jax.lax.dot_general(
                xs[l], dh16, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_blk = jnp.sum(dh, axis=0, keepdims=True)
            dg_blk = jnp.sum(dy * yhat, axis=0, keepdims=True)
            dbe_blk = jnp.sum(dy, axis=0, keepdims=True)

            dwr, dbr, dgr, dber = dw_refs[l], db_refs[l], dg_refs[l], dbe_refs[l]

            @pl.when(i == 0)
            def _init(dwr=dwr, dbr=dbr, dgr=dgr, dber=dber, dw_blk=dw_blk,
                      db_blk=db_blk, dg_blk=dg_blk, dbe_blk=dbe_blk):
                dwr[0] = dw_blk
                dbr[0] = db_blk
                dgr[0] = dg_blk
                dber[0] = dbe_blk

            @pl.when(i > 0)
            def _acc(dwr=dwr, dbr=dbr, dgr=dgr, dber=dber, dw_blk=dw_blk,
                     db_blk=db_blk, dg_blk=dg_blk, dbe_blk=dbe_blk):
                dwr[0] += dw_blk
                dbr[0] += db_blk
                dgr[0] += dg_blk
                dber[0] += dbe_blk

            if l > 0:
                dy = jax.lax.dot_general(
                    dh16, ws[l][0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                # layer-0 dx only where the feature-LN grads (or dx) need it
                dx_raw = jax.lax.dot_general(
                    dh16, ws[0][0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        dg0_blk = jnp.sum(dx_raw * xhat.astype(jnp.float32), axis=0, keepdims=True)
        db0_blk = jnp.sum(dx_raw, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _init0():
            dg0_ref[0] = dg0_blk
            db0_ref[0] = db0_blk

        @pl.when(i > 0)
        def _acc0():
            dg0_ref[0] += dg0_blk
            db0_ref[0] += db0_blk

        if need_dx:
            dx_ref[0] = (dx_raw * g0).astype(dx_ref.dtype)
    return kernel


def _pick_tower_bm(B: int) -> int:
    import os
    forced = int(os.environ.get("FUSED_TOWER_BM", "0"))
    if forced and B % forced == 0:
        return forced
    # smaller than the per-layer default: the tower holds L activations +
    # L weight-grad accumulators in VMEM per row block
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if B % bm == 0:
            return bm
    return 0


def _tower_specs(N, B, Din, H, L, bm):
    row = lambda d: pl.BlockSpec((1, bm, d), lambda n, i: (n, i, 0))
    const = lambda s: pl.BlockSpec((1,) + s, lambda n, i: (n, 0, 0))
    w_specs = [const((Din if l == 0 else H, H)) for l in range(L)]
    vec_specs = [const((1, H)) for _ in range(L)]
    return row, const, w_specs, vec_specs


def _tower_fwd_call(x, g0, b0, ws, bs, gs, bes, bm: int, interpret: bool):
    N, B, Din = x.shape
    H = ws[0].shape[-1]
    L = len(ws)
    row, const, w_specs, vec_specs = _tower_specs(N, B, Din, H, L, bm)
    ws16 = [w.astype(jnp.bfloat16) for w in ws]
    y = pl.pallas_call(
        _tower_fwd_kernel(L),
        grid=(N, B // bm),
        in_specs=[row(Din), const((1, Din)), const((1, Din))]
        + w_specs + vec_specs + vec_specs + vec_specs,
        out_specs=row(H),
        out_shape=jax.ShapeDtypeStruct((N, B, H), jnp.bfloat16),
        interpret=interpret,
    )(x, g0[:, None, :], b0[:, None, :], *ws16,
      *[b[:, None, :] for b in bs], *[g[:, None, :] for g in gs],
      *[be[:, None, :] for be in bes])
    return y


def _tower_bwd_call(dy, x, g0, b0, ws, bs, gs, bes, bm: int, interpret: bool,
                    need_dx: bool):
    N, B, Din = x.shape
    H = ws[0].shape[-1]
    L = len(ws)
    row, const, w_specs, vec_specs = _tower_specs(N, B, Din, H, L, bm)
    ws16 = [w.astype(jnp.bfloat16) for w in ws]
    out_specs = ([row(Din)] if need_dx else []) \
        + w_specs + vec_specs + vec_specs + vec_specs \
        + [const((1, Din)), const((1, Din))]
    out_shape = ([jax.ShapeDtypeStruct((N, B, Din), jnp.bfloat16)] if need_dx else []) \
        + [jax.ShapeDtypeStruct((N, Din if l == 0 else H, H), jnp.float32)
           for l in range(L)] \
        + [jax.ShapeDtypeStruct((N, 1, H), jnp.float32)] * (3 * L) \
        + [jax.ShapeDtypeStruct((N, 1, Din), jnp.float32)] * 2
    outs = pl.pallas_call(
        _tower_bwd_kernel(L, need_dx),
        grid=(N, B // bm),
        in_specs=[row(H), row(Din), const((1, Din)), const((1, Din))]
        + w_specs + vec_specs + vec_specs + vec_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(dy, x, g0[:, None, :], b0[:, None, :], *ws16,
      *[b[:, None, :] for b in bs], *[g[:, None, :] for g in gs],
      *[be[:, None, :] for be in bes])
    o = 0
    dx = outs[0] if need_dx else None
    o += 1 if need_dx else 0
    dws = list(outs[o:o + L])
    dbs = [t[:, 0, :] for t in outs[o + L:o + 2 * L]]
    dgs = [t[:, 0, :] for t in outs[o + 2 * L:o + 3 * L]]
    dbes = [t[:, 0, :] for t in outs[o + 3 * L:o + 4 * L]]
    dg0 = outs[o + 4 * L][:, 0, :]
    db0 = outs[o + 4 * L + 1][:, 0, :]
    return dx, dws, dbs, dgs, dbes, dg0, db0


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_tower(x, g0, b0, ws, bs, gs, bes, bm: int, interpret: bool,
              need_dx: bool):
    """Whole L-layer MLPBase tower, one fused kernel each way.

    x [N,B,Din] bf16 pre-normalized features; g0/b0 [N,Din] feature-LN
    learnables; ws/bs/gs/bes: length-L tuples of per-layer Dense kernel
    [N,Din_l,H] (f32 masters), bias [N,H], LN scale/bias [N,H].  All hidden
    widths equal H (128-multiple); Din 128-multiple; B % bm == 0.  With
    need_dx=False the x cotangent is zeros (obs are data in PPO updates).
    Returns y [N,B,H] bf16.
    """
    return _tower_fwd_call(x, g0, b0, ws, bs, gs, bes, bm, interpret)


def _tower_vjp_fwd(x, g0, b0, ws, bs, gs, bes, bm, interpret, need_dx):
    y = _tower_fwd_call(x, g0, b0, ws, bs, gs, bes, bm, interpret)
    return y, (x, g0, b0, ws, bs, gs, bes)


def _tower_vjp_bwd(bm, interpret, need_dx, res, dy):
    x, g0, b0, ws, bs, gs, bes = res
    dx, dws, dbs, dgs, dbes, dg0, db0 = _tower_bwd_call(
        dy.astype(jnp.bfloat16), x, g0, b0, ws, bs, gs, bes, bm, interpret,
        need_dx)
    if dx is None:
        dx = jnp.zeros_like(x)
    return dx, dg0, db0, tuple(dws), tuple(dbs), tuple(dgs), tuple(dbes)


mlp_tower.defvjp(_tower_vjp_fwd, _tower_vjp_bwd)


# ---------------------------------------------------------------------------
# manual JVP path (Fisher-vector products)
# ---------------------------------------------------------------------------
#
# HATRPO's conjugate-gradient needs Fisher-vector products.  jvp(grad(kl))
# cannot ride the custom-VJP kernels (forward-over-reverse would need a JVP
# rule for the backward pallas_call), so the FVP is assembled MANUALLY via
# the Gauss-Newton identity  F v = J^T M (J v)  (exact: the KL's output-space
# gradient vanishes at the linearization point).  J v is computed here: the
# fused forward kernel supplies (y, a) per layer and the directional tangent
# runs in plain XLA from those activations (2 matmuls + LN chain per layer -
# forward-pass cost class).  J^T u reuses the fused custom-VJP backward.
# These helpers carry NO jax AD registration - callers orchestrate.


def _ln_tangent(a, da, g, dg, dbe):
    """Directional tangent of y = LN(a)*g + dbe given da (and dg/dbe)."""
    af = a.astype(jnp.float32)
    mu = jnp.mean(af, -1, keepdims=True)
    var = jnp.mean(jnp.square(af - mu), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    yhat = (af - mu) * inv
    m1 = jnp.mean(da, -1, keepdims=True)
    m2 = jnp.mean(da * yhat, -1, keepdims=True)
    dyhat = (da - m1 - yhat * m2) * inv
    return dyhat * g[:, None, :] + yhat * dg[:, None, :] + dbe[:, None, :]


def mlp_base_stacked_linearize(params: dict, x: jnp.ndarray,
                               layer_n: int = 2, prenormed: bool = False,
                               interpret: bool | None = None):
    """Forward on the fused kernels + everything the parameter-directional
    tangent needs, saved ONCE at the linearization point.

    Returns (h, saved).  `saved` holds per layer: the layer input stream
    (bf16), the post-input-affine stream xt (bf16, constant across tangent
    calls), the activation a, and the padded W - so repeated tangent
    evaluations (HATRPO runs ~11 Fisher-vector products per CG solve at a
    FIXED linearization point, runner.py trpo_actor_update) never re-run the
    fused forward.  `mlp_base_stacked_tangent` consumes it.
    """
    if interpret is None:
        interpret = _auto_interpret()
    N, B, _ = x.shape
    bm = _pick_bm(B)
    if bm == 0:
        raise ValueError(f"B={B} has no supported row block")
    if not prenormed:
        x = feature_norm(x)
    h = x
    saved = []
    for li in range(1 + layer_n):
        w = params[f"Dense_{li}"]["kernel"]
        if w.shape[1] % 128:
            w = jnp.pad(w, [(0, 0), (0, (-w.shape[1]) % 128), (0, 0)])
        bias = params[f"Dense_{li}"]["bias"]
        ln = params[f"LayerNorm_{li + 1}"]
        din = w.shape[1]
        if li == 0:
            ln0 = params["LayerNorm_0"]
            pad0 = din - ln0["scale"].shape[-1]
            g0 = jnp.pad(ln0["scale"], [(0, 0), (0, pad0)])
            b0 = jnp.pad(ln0["bias"], [(0, 0), (0, pad0)])
        else:
            g0 = jnp.ones((N, din), jnp.float32)
            b0 = jnp.zeros((N, din), jnp.float32)
        y, a = _fwd_call(h, w, bias, ln["scale"], ln["bias"], g0, b0,
                         bm, interpret)
        xf = h.astype(jnp.float32)
        xt = (xf * g0[:, None, :] + b0[:, None, :]).astype(jnp.bfloat16)
        saved.append(dict(x=h, xt=xt, a=a, w16=w.astype(jnp.bfloat16),
                          g0=g0, scale=ln["scale"]))
        h = y
    return h, saved


def mlp_base_stacked_tangent(dparams: dict, saved,
                             layer_n: int = 2) -> jnp.ndarray:
    """Parameter-directional tangent dh from a saved linearization
    (`mlp_base_stacked_linearize`).  Plain XLA; no fused-forward re-run.
    The obs tangent is zero (FVPs differentiate w.r.t. parameters only);
    every primal-side operand the tangent needs lives in `saved`."""
    dh = None
    for li in range(1 + layer_n):
        s = saved[li]
        dw = dparams[f"Dense_{li}"]["kernel"]
        if dw.shape[1] % 128:
            dw = jnp.pad(dw, [(0, 0), (0, (-dw.shape[1]) % 128), (0, 0)])
        dbias = dparams[f"Dense_{li}"]["bias"]
        dln = dparams[f"LayerNorm_{li + 1}"]
        din = dw.shape[1]
        N = dw.shape[0]
        if li == 0:
            dln0 = dparams["LayerNorm_0"]
            pad0 = din - dln0["scale"].shape[-1]
            dg0 = jnp.pad(dln0["scale"], [(0, 0), (0, pad0)])
            db0 = jnp.pad(dln0["bias"], [(0, 0), (0, pad0)])
        else:
            dg0 = db0 = jnp.zeros((N, din), jnp.float32)
        # dh_pre = (dx*g0 + x*dg0 + db0) @ W + (x*g0 + b0) @ dW + db
        xf = s["x"].astype(jnp.float32)
        dxin = xf * dg0[:, None, :] + db0[:, None, :]
        if dh is not None:
            dxin = dxin + dh * s["g0"][:, None, :]
        dhp = jnp.einsum("nbi,nio->nbo", dxin.astype(jnp.bfloat16), s["w16"],
                         preferred_element_type=jnp.float32) \
            + jnp.einsum("nbi,nio->nbo", s["xt"], dw.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) \
            + dbias[:, None, :]
        af = s["a"].astype(jnp.float32)
        da = jnp.where(af > 0, 1.0, af + 1.0) * dhp   # elu'(h) from a
        dh = _ln_tangent(s["a"], da, s["scale"], dln["scale"], dln["bias"])
    return dh


def mlp_base_stacked_jvp(params: dict, dparams: dict, x: jnp.ndarray,
                         layer_n: int = 2, prenormed: bool = False,
                         interpret: bool | None = None):
    """(h, dh): mlp_base_stacked forward + its parameter-directional tangent.

    One-shot convenience composition of linearize + tangent (kept for the
    equivalence tests); repeated-tangent callers (HATRPO CG) should hoist
    `mlp_base_stacked_linearize` and call `mlp_base_stacked_tangent`.
    """
    h, saved = mlp_base_stacked_linearize(params, x, layer_n=layer_n,
                                          prenormed=prenormed,
                                          interpret=interpret)
    dh = mlp_base_stacked_tangent(dparams, saved, layer_n=layer_n)
    return h, dh


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

    # whole-tower fused path: one kernel for all layers (fwd), one with
    # in-register recompute (bwd) - see the tower section above.  OFF by
    # default: on v5e the 16 MB scoped-VMEM limit caps the tower at bm=512
    # (bm=1024 needs 17.2 MB), and at bm=512 the shorter pipeline loses to
    # the per-layer bm=1024 kernels (measured 179.0 vs 167.0 ms per MAPPO
    # iteration at E=4096) - the HBM traffic it saves is outweighed by the
    # reduced prefetch overlap.  FUSED_TOWER=1 opts in (future chips with
    # larger VMEM may flip the verdict).
    # NOTE: the tower path hardcodes need_dx=False - the x cotangent is
    # zeros.  Fine for the MARL update (obs are data), wrong for any caller
    # differentiating through the input; such callers must keep FUSED_TOWER
    # off or call mlp_tower(..., need_dx=True) directly.
    import os
    tower_bm = _pick_tower_bm(B)
    if (use_feature_normalization and os.environ.get("FUSED_TOWER", "0") == "1"
            and tower_bm > 0):
        L = 1 + layer_n
        ws, bs, gs, bes = [], [], [], []
        din0 = h.shape[-1]
        for li in range(L):
            w = params[f"Dense_{li}"]["kernel"]
            if w.shape[1] % 128:
                w = jnp.pad(w, [(0, 0), (0, (-w.shape[1]) % 128), (0, 0)])
            ws.append(w)
            bs.append(params[f"Dense_{li}"]["bias"])
            ln = params[f"LayerNorm_{li + 1}"]
            gs.append(ln["scale"])
            bes.append(ln["bias"])
        H = ws[0].shape[-1]
        same_h = all(w.shape[-1] == H for w in ws) and \
            all(w.shape[1] == H for w in ws[1:]) and ws[0].shape[1] == din0
        if same_h and H % 128 == 0:
            ln0 = params["LayerNorm_0"]
            pad = din0 - ln0["scale"].shape[-1]
            g0 = jnp.pad(ln0["scale"], [(0, 0), (0, pad)])
            b0 = jnp.pad(ln0["bias"], [(0, 0), (0, pad)])
            return mlp_tower(h, g0, b0, tuple(ws), tuple(bs), tuple(gs),
                             tuple(bes), tower_bm, interpret, False)

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
