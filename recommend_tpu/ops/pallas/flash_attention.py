"""Fused band-masked flash attention — the Pallas kernel behind the ranking
stack's Table-5 optimizations (SURVEY.md §7 phase 5).

One kernel realizes three reference capabilities at once:
  - FlashAttention (claimed by oneTrans config.py:66-69, never implemented):
    blocked online-softmax; the [Lq, Lkv] logit matrix never hits HBM.
  - Pyramid tail-query pruning (oneTrans model.py:280-302): the query window
    is simply Lq < Lkv rows whose absolute positions sit at the tail
    (``q_offset = Lkv - Lq``) — the same causal *band* mask the jnp path uses
    (`recommend_tpu.ops.attention.causal_band_mask`).
  - Key padding: a per-key additive bias row folds the validity mask in.

Kernel layout: batch and heads collapse to one leading grid dim
(q [BH, Lq, Dh]; bias/lse as [BH, 1, L] so the TPU block-shape rules are
satisfied). Causal-band kv blocks strictly above the band are skipped, so
cost tracks the realized band, not Lq×Lkv.

Custom VJP: forward saves per-row logsumexp; backward recomputes
probabilities blockwise (dq kernel over q-rows; dk/dv kernel over kv-rows),
masked identically to forward.

Numerics match the jnp reference path (softmax in f32, -1e9 masking => rows
with zero valid keys degrade to a uniform distribution rather than NaN).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _band_bias(iq, ik, bq: int, bk: int, q_offset: int, causal: bool):
    if not causal:
        return None
    q_pos = q_offset + iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kv_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    return jnp.where(kv_pos <= q_pos, 0.0, NEG_INF)


def _run_block(iq, ik, bq: int, bk: int, q_offset: int, causal: bool):
    if not causal:
        return True
    return ik * bk <= q_offset + iq * bq + bq - 1


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, sm_scale: float, q_offset: int, causal: bool, bq: int, bk: int,
):
    iq, ik = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(_run_block(iq, ik, bq, bk, q_offset, causal))
    def _body():
        q = q_ref[0]  # [bq, dh]
        k = k_ref[0]  # [bk, dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + bias_ref[0, 0][None, :]
        band = _band_bias(iq, ik, bq, bk, q_offset, causal)
        if band is not None:
            s = s + band
        m_prev = m_ref[:, 0][:, None]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_ref[:, 0][:, None]
        o_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[0, 0] = m_ref[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30))


def _dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
    acc_ref,
    *, sm_scale: float, q_offset: int, causal: bool, bq: int, bk: int,
):
    iq, ik = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(_run_block(iq, ik, bq, bk, q_offset, causal))
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + bias_ref[0, 0][None, :]
        band = _band_bias(iq, ik, bq, bk, q_offset, causal)
        if band is not None:
            s = s + band
        p = jnp.exp(s - lse_ref[0, 0][:, None])
        do = do_ref[0]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0, 0][:, None]) * sm_scale
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, sm_scale: float, q_offset: int, causal: bool, bq: int, bk: int,
):
    ik, iq = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(_run_block(iq, ik, bq, bk, q_offset, causal))
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + bias_ref[0, 0][None, :]
        band = _band_bias(iq, ik, bq, bk, q_offset, causal)
        if band is not None:
            s = s + band
        p = jnp.exp(s - lse_ref[0, 0][:, None])  # [bq, bk]
        do = do_ref[0]
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0, 0][:, None]) * sm_scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pad_axis(x: jax.Array, axis: int, target: int, value=0.0) -> jax.Array:
    n = x.shape[axis]
    if n == target:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return jnp.pad(x, widths, constant_values=value)


def _prep(q, k, v, kv_bias, bq, bk):
    """[BH, L, Dh] inputs padded to block multiples; bias → [BH, 1, Lkv_p]."""
    lq, lkv = q.shape[1], k.shape[1]
    lq_p, lkv_p = _round_up(lq, bq), _round_up(lkv, bk)
    qp = _pad_axis(q, 1, lq_p)
    kp = _pad_axis(k, 1, lkv_p)
    vp = _pad_axis(v, 1, lkv_p)
    bias_p = _pad_axis(kv_bias, 1, lkv_p, value=NEG_INF)[:, None, :]
    return qp, kp, vp, bias_p, lq_p, lkv_p


_SEMANTICS = ("parallel", "parallel", "arbitrary")


def _flash_fwd_impl(q, k, v, kv_bias, *, sm_scale, q_offset, causal, bq, bk):
    bh, lq, dh = q.shape
    qp, kp, vp, bias_p, lq_p, lkv_p = _prep(q, k, v, kv_bias, bq, bk)
    grid = (bh, lq_p // bq, lkv_p // bk)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        bq=bq, bk=bk,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, iq, ik: (b, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_p, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dh), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=_SEMANTICS),
    )(qp, kp, vp, bias_p)
    return out[:, :lq], lse[:, :, :lq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_band_attention(
    q: jax.Array,  # [BH, Lq, Dh]
    k: jax.Array,  # [BH, Lkv, Dh]
    v: jax.Array,  # [BH, Lkv, Dh]
    kv_bias: jax.Array,  # [BH, Lkv] additive (0 valid / -1e9 padded)
    sm_scale: float,
    q_offset: int,
    causal: bool = True,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    out, _ = _flash_fwd_impl(
        q, k, v, kv_bias, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        bq=block_q, bk=block_k,
    )
    return out


def _flash_fwd(q, k, v, kv_bias, sm_scale, q_offset, causal, block_q, block_k):
    out, lse = _flash_fwd_impl(
        q, k, v, kv_bias, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        bq=block_q, bk=block_k,
    )
    return out, (q, k, v, kv_bias, out, lse)


def _flash_bwd(sm_scale, q_offset, causal, block_q, block_k, res, do):
    q, k, v, kv_bias, out, lse = res
    bh, lq, dh = q.shape
    lkv = k.shape[1]
    bq, bk = block_q, block_k

    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = delta[:, None, :]  # [BH, 1, Lq]

    qp, kp, vp, bias_p, lq_p, lkv_p = _prep(q, k, v, kv_bias, bq, bk)
    dop = _pad_axis(do, 1, lq_p)
    lsep = _pad_axis(lse, 2, lq_p)
    deltap = _pad_axis(delta, 2, lq_p)

    dq_kernel = functools.partial(
        _dq_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        bq=bq, bk=bk,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, lq_p // bq, lkv_p // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik)),
            pl.BlockSpec((1, bq, dh), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, iq, ik: (b, 0, iq)),
            pl.BlockSpec((1, 1, bq), lambda b, iq, ik: (b, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=_SEMANTICS),
    )(qp, kp, vp, bias_p, dop, lsep, deltap)[:, :lq]

    dkv_kernel = functools.partial(
        _dkv_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        bq=bq, bk=bk,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, lkv_p // bk, lq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, ik, iq: (b, 0, ik)),
            pl.BlockSpec((1, bq, dh), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, ik, iq: (b, 0, iq)),
            pl.BlockSpec((1, 1, bq), lambda b, ik, iq: (b, 0, iq)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, dh), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lkv_p, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, lkv_p, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=_SEMANTICS),
    )(qp, kp, vp, bias_p, dop, lsep, deltap)
    return dq, dk[:, :lkv], dv[:, :lkv], None


flash_band_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Fused small-sequence band attention
#
# At recommendation-model lengths (post-pyramid Lq≈100-200, Lkv≈200-400) the
# blocked flash kernel above loses to XLA: its grid is (B·H, 1, 1), so every
# grid step does ONE tiny half-MXU matmul and fixed per-step costs dominate.
# The profile of the ranking train step instead shows the cost is HBM traffic
# from the materialized f32 [B, H, Lq, Lkv] probabilities (~0.5 GB/layer).
#
# This kernel removes that traffic a different way: the whole (padded)
# Lq×Lkv tile fits in VMEM, so there is no online softmax and no kv-block
# loop at all — one grid step processes a GROUP of `g` batch·head rows,
# computing full-row softmax per row. Backward is ONE kernel producing
# dq/dk/dv together (probabilities recomputed from the saved logsumexp).
# ---------------------------------------------------------------------------

FUSED_GROUP = 8  # batch·head rows per grid step
FUSED_MAX_KV = 1024  # beyond this the padded tile stops fitting comfortably


def _fused_band(lq_p: int, lkv_p: int, q_offset: int, causal: bool):
    if not causal:
        return None
    q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (lq_p, lkv_p), 0)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (lq_p, lkv_p), 1)
    return jnp.where(kv_pos <= q_pos, 0.0, NEG_INF)


# batched dot_general dimension numbers over the leading group dim
_BD_QKT = (((2,), (2,)), ((0,), (0,)))   # [g,a,d]×[g,b,d] → [g,a,b]
_BD_PV = (((2,), (1,)), ((0,), (0,)))    # [g,a,b]×[g,b,d] → [g,a,d]
_BD_PTDO = (((1,), (1,)), ((0,), (0,)))  # [g,a,b]×[g,a,d] → [g,b,d]


def _mask_rows(x: jax.Array, dim: int, n: int):
    """Zero every slice of ``x`` at index ≥ n along ``dim`` (jnp.where, NOT
    multiply — edge garbage can be NaN and NaN·0 = NaN). Used to sanitize
    the final oversized Pallas block of the unpadded-input path: inputs
    arrive with their TRUE lengths and out-of-bounds loads are GARBAGE
    (arbitrary bits, possibly inf/NaN patterns; out-of-bounds stores are
    dropped). The mask is a full-rank iota comparison — Mosaic cannot
    broadcast an i1 vector with minor-dim insertion on 16-bit payloads."""
    if x.shape[dim] == n:
        return x
    keep = jax.lax.broadcasted_iota(jnp.int32, x.shape, dim) < n
    return jnp.where(keep, x, jnp.zeros((), x.dtype))


def _fused_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    *, sm_scale: float, q_offset: int, causal: bool, g: int,
    lq: int, lkv: int,
):
    lq_p, lkv_p = q_ref.shape[1], k_ref.shape[1]
    band = _fused_band(lq_p, lkv_p, q_offset, causal)
    q = _mask_rows(q_ref[:], 1, lq)
    k = _mask_rows(k_ref[:], 1, lkv)
    v = _mask_rows(v_ref[:], 1, lkv)
    s = jax.lax.dot_general(
        q, k, _BD_QKT, preferred_element_type=jnp.float32
    ) * sm_scale
    s = s + bias_ref[:][:, None, :]  # bias IS padded (NEG_INF beyond lkv)
    if band is not None:
        s = s + band[None]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, _BD_PV,
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = m[:, :, 0] + jnp.log(jnp.maximum(l[:, :, 0], 1e-30))


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, sm_scale: float, q_offset: int, causal: bool, g: int,
    lq: int, lkv: int,
):
    lq_p, lkv_p = q_ref.shape[1], k_ref.shape[1]
    band = _fused_band(lq_p, lkv_p, q_offset, causal)
    # q/k/v/do arrive UNPADDED in their L dims — sanitize the oversized
    # final block's garbage tail; lse/delta/bias are physically padded
    # (deterministic values), no sanitization needed
    q = _mask_rows(q_ref[:], 1, lq)
    k = _mask_rows(k_ref[:], 1, lkv)
    v = _mask_rows(v_ref[:], 1, lkv)
    do = _mask_rows(do_ref[:], 1, lq)
    lse, delta = lse_ref[:], delta_ref[:]
    s = jax.lax.dot_general(
        q, k, _BD_QKT, preferred_element_type=jnp.float32
    ) * sm_scale
    s = s + bias_ref[:][:, None, :]
    if band is not None:
        s = s + band[None]
    p = jnp.exp(s - lse[:, :, None])  # [g, lq_p, lkv_p]
    if lq != lq_p:
        # q-tail rows: s is finite (q rows zeroed) but lse there is the
        # forward's value for a ZERO query — p would be a valid softmax row,
        # not zero; mask so it cannot pollute dk/dv
        p = _mask_rows(p, 1, lq)
    pc = p.astype(do.dtype)
    dv_ref[:] = jax.lax.dot_general(
        pc, do, _BD_PTDO, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, _BD_QKT, preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta[:, :, None]) * sm_scale).astype(k.dtype)
    dq_ref[:] = jax.lax.dot_general(
        ds, k, _BD_PV, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[:] = jax.lax.dot_general(
        ds, q, _BD_PTDO, preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _fused_prep(q, k, v, kv_bias, g: int):
    """Compute padded BLOCK sizes (Lq → sublane multiple, Lkv → lane
    multiple, BH → group multiple). Only the BH dim and the KB-sized 2D
    bias are physically padded; the MB-sized 3D q/k/v stay UNPADDED — their
    blocks satisfy Mosaic's (8, 128) divisibility on the last two dims
    (lq_p/lkv_p, dh), so the final oversized block is edge-masked in the
    kernel (see _edge_masks). This saves the pad/slice HBM round-trips the
    old path paid on every activation tensor (~0.3 ms/layer, docs/PERF.md).
    2D arrays (bias, lse, delta) can't ride that path — their last block
    dim would be lq_p/lkv_p itself, which Mosaic only allows if it equals
    the array dim — so they stay padded; they are ~100× smaller."""
    bh, lq, dh = q.shape
    lkv = k.shape[1]
    lq_p = _round_up(lq, 16)
    lkv_p = _round_up(lkv, 128)
    bh_p = _round_up(bh, g)
    qp = _pad_axis(q, 0, bh_p)
    kp = _pad_axis(k, 0, bh_p)
    vp = _pad_axis(v, 0, bh_p)
    bias_p = _pad_axis(_pad_axis(kv_bias, 1, lkv_p, value=NEG_INF), 0, bh_p)
    return qp, kp, vp, bias_p, bh_p, lq_p, lkv_p


def _fused_fwd_impl(q, k, v, kv_bias, *, sm_scale, q_offset, causal, g):
    bh, lq, dh = q.shape
    lkv = k.shape[1]
    qp, kp, vp, bias_p, bh_p, lq_p, lkv_p = _fused_prep(q, k, v, kv_bias, g)
    kernel = functools.partial(
        _fused_fwd_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        g=g, lq=lq, lkv=lkv,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh_p // g,),
        in_specs=[
            pl.BlockSpec((g, lq_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, lq_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lq_p), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh_p, lq, dh), q.dtype),
            jax.ShapeDtypeStruct((bh_p, lq_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh_p * lq_p * lkv_p * dh,
            bytes_accessed=2 * bh_p * (2 * lq_p + 2 * lkv_p) * dh,
            transcendentals=bh_p * lq_p * lkv_p,
        ),
    )(qp, kp, vp, bias_p)
    # lse keeps its lq_p padding (deterministic finite values — tail rows'
    # softmax runs over zeroed q/k, NOT zero; backward correctness rests on
    # the p row-mask, not on the lse values) and rides the residuals padded
    return out[:bh], lse[:bh]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_band_attention(
    q: jax.Array,  # [BH, Lq, Dh]
    k: jax.Array,  # [BH, Lkv, Dh]
    v: jax.Array,
    kv_bias: jax.Array,  # [BH, Lkv] additive (0 valid / -1e9 padded)
    sm_scale: float,
    q_offset: int,
    causal: bool = True,
    group: int = FUSED_GROUP,
) -> jax.Array:
    out, _ = _fused_fwd_impl(
        q, k, v, kv_bias, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        g=group,
    )
    return out


def _fused_vjp_fwd(q, k, v, kv_bias, sm_scale, q_offset, causal, group):
    out, lse = _fused_fwd_impl(
        q, k, v, kv_bias, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        g=group,
    )
    return out, (q, k, v, kv_bias, out, lse)


def _fused_vjp_bwd(sm_scale, q_offset, causal, group, res, do):
    q, k, v, kv_bias, out, lse = res
    bh, lq, dh = q.shape
    lkv = k.shape[1]
    g = group
    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)

    qp, kp, vp, bias_p, bh_p, lq_p, lkv_p = _fused_prep(q, k, v, kv_bias, g)
    dop = _pad_axis(do, 0, bh_p)  # 3D: stays unpadded in lq (edge-masked)
    lsep = _pad_axis(lse, 0, bh_p)  # already [bh, lq_p] from the forward
    deltap = _pad_axis(_pad_axis(delta, 1, lq_p), 0, bh_p)  # 2D: padded

    kernel = functools.partial(
        _fused_bwd_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        g=g, lq=lq, lkv=lkv,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh_p // g,),
        in_specs=[
            pl.BlockSpec((g, lq_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p), lambda b: (b, 0)),
            pl.BlockSpec((g, lq_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lq_p), lambda b: (b, 0)),
            pl.BlockSpec((g, lq_p), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, lq_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, dh), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh_p, lq, dh), q.dtype),
            jax.ShapeDtypeStruct((bh_p, lkv, dh), k.dtype),
            jax.ShapeDtypeStruct((bh_p, lkv, dh), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh_p * lq_p * lkv_p * dh,
            bytes_accessed=4 * bh_p * (2 * lq_p + 3 * lkv_p) * dh,
            transcendentals=bh_p * lq_p * lkv_p,
        ),
    )(qp, kp, vp, bias_p, dop, lsep, deltap)
    return dq[:bh], dk[:bh], dv[:bh], None


fused_band_attention.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# ---------------------------------------------------------------------------
# Multi-head fused band attention in MODEL layout [B, L, H·Dh]
#
# The 3D fused kernel above takes [B·H, L, Dh], which costs a
# swapaxes(1, 2) HBM copy per tensor per direction around every layer
# (~0.3 ms each at bench shapes — profiled as the copy/copy_bitcast family
# in docs/PERF.md). These kernels instead take exactly what the model's
# projections produce — [B, L, H·Dh], heads contiguous on the lane dim —
# and slice per-head Dh column blocks INSIDE the kernel (free when
# Dh % 128 == 0: the slice is whole lanes). Zero layout copies end to end;
# the per-head bias is also shared ([B, Lkv], not materialized per head).
# ---------------------------------------------------------------------------


def _fmh_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    *, sm_scale: float, q_offset: int, causal: bool,
    h: int, dh: int, lq: int, lkv: int,
):
    lq_p, lkv_p = q_ref.shape[1], k_ref.shape[1]
    band = _fused_band(lq_p, lkv_p, q_offset, causal)
    q = _mask_rows(q_ref[:], 1, lq)
    k = _mask_rows(k_ref[:], 1, lkv)
    v = _mask_rows(v_ref[:], 1, lkv)
    bias = bias_ref[:][:, 0, :]  # [g, lkv_p], NEG_INF-padded
    outs, lses = [], []
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], _BD_QKT,
            preferred_element_type=jnp.float32,
        ) * sm_scale
        s = s + bias[:, None, :]
        if band is not None:
            s = s + band[None]
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=2, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, sl], _BD_PV,
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
        lses.append(m[:, :, 0] + jnp.log(jnp.maximum(l[:, :, 0], 1e-30)))
    o_ref[:] = jnp.concatenate(outs, axis=2)
    lse_ref[:] = jnp.stack(lses, axis=1)  # [g, h, lq_p]


def _fmh_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, sm_scale: float, q_offset: int, causal: bool,
    h: int, dh: int, lq: int, lkv: int,
):
    lq_p, lkv_p = q_ref.shape[1], k_ref.shape[1]
    band = _fused_band(lq_p, lkv_p, q_offset, causal)
    q = _mask_rows(q_ref[:], 1, lq)
    k = _mask_rows(k_ref[:], 1, lkv)
    v = _mask_rows(v_ref[:], 1, lkv)
    do = _mask_rows(do_ref[:], 1, lq)
    lse, delta = lse_ref[:], delta_ref[:]
    bias = bias_ref[:][:, 0, :]
    dqs, dks, dvs = [], [], []
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        qh, kh, vh, doh = q[:, :, sl], k[:, :, sl], v[:, :, sl], do[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, _BD_QKT, preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + bias[:, None, :]
        if band is not None:
            s = s + band[None]
        p = jnp.exp(s - lse[:, i, :][:, :, None])
        if lq != lq_p:
            p = _mask_rows(p, 1, lq)  # see _fused_bwd_kernel
        pc = p.astype(doh.dtype)
        dvs.append(jax.lax.dot_general(
            pc, doh, _BD_PTDO, preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype))
        dp = jax.lax.dot_general(
            doh, vh, _BD_QKT, preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta[:, i, :][:, :, None]) * sm_scale).astype(kh.dtype)
        dqs.append(jax.lax.dot_general(
            ds, kh, _BD_PV, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype))
        dks.append(jax.lax.dot_general(
            ds, qh, _BD_PTDO, preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype))
    dq_ref[:] = jnp.concatenate(dqs, axis=2)
    dk_ref[:] = jnp.concatenate(dks, axis=2)
    dv_ref[:] = jnp.concatenate(dvs, axis=2)


def _fmh_prep(q, k, v, kv_bias, g: int):
    b, lq, hdh = q.shape
    lkv = k.shape[1]
    lq_p = _round_up(lq, 16)
    lkv_p = _round_up(lkv, 128)
    b_p = _round_up(b, g)
    qp = _pad_axis(q, 0, b_p)
    kp = _pad_axis(k, 0, b_p)
    vp = _pad_axis(v, 0, b_p)
    # bias rides as [B, 1, Lkv_p]: a 2D (g, lkv_p) block would need g % 8
    # == 0, but g scales down with the head count (VMEM stack cap)
    bias_p = _pad_axis(
        _pad_axis(kv_bias, 1, lkv_p, value=NEG_INF), 0, b_p
    )[:, None, :]
    return qp, kp, vp, bias_p, b_p, lq_p, lkv_p


def _fmh_fwd_impl(q, k, v, kv_bias, *, sm_scale, q_offset, causal, h, g):
    b, lq, hdh = q.shape
    lkv = k.shape[1]
    dh = hdh // h
    qp, kp, vp, bias_p, b_p, lq_p, lkv_p = _fmh_prep(q, k, v, kv_bias, g)
    kernel = functools.partial(
        _fmh_fwd_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        h=h, dh=dh, lq=lq, lkv=lkv,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b_p // g,),
        in_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, 1, lkv_p), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, h, lq_p), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_p, lq, hdh), q.dtype),
            jax.ShapeDtypeStruct((b_p, h, lq_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_p * h * lq_p * lkv_p * dh,
            bytes_accessed=2 * b_p * (2 * lq_p + 2 * lkv_p) * hdh,
            transcendentals=b_p * h * lq_p * lkv_p,
        ),
    )(qp, kp, vp, bias_p)
    return out[:b], lse[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_mh_band_attention(
    q: jax.Array,  # [B, Lq, H·Dh]  (model layout, heads on the lane dim)
    k: jax.Array,  # [B, Lkv, H·Dh]
    v: jax.Array,
    kv_bias: jax.Array,  # [B, Lkv] additive (0 valid / -1e9 padded)
    sm_scale: float,
    q_offset: int,
    causal: bool = True,
    h: int = 1,
    group: int = FUSED_GROUP,
) -> jax.Array:
    out, _ = _fmh_fwd_impl(
        q, k, v, kv_bias, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        h=h, g=group,
    )
    return out


def _fmh_vjp_fwd(q, k, v, kv_bias, sm_scale, q_offset, causal, h, group):
    out, lse = _fmh_fwd_impl(
        q, k, v, kv_bias, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        h=h, g=group,
    )
    return out, (q, k, v, kv_bias, out, lse)


def _fmh_vjp_bwd(sm_scale, q_offset, causal, h, group, res, do):
    q, k, v, kv_bias, out, lse = res
    b, lq, hdh = q.shape
    lkv = k.shape[1]
    dh = hdh // h
    g = group
    # per-head delta: [B, lq, h] → [B, h, lq_p] (KB-sized; padded like lse)
    delta = jnp.sum(
        out.astype(jnp.float32).reshape(b, lq, h, dh)
        * do.astype(jnp.float32).reshape(b, lq, h, dh),
        axis=-1,
    ).transpose(0, 2, 1)
    qp, kp, vp, bias_p, b_p, lq_p, lkv_p = _fmh_prep(q, k, v, kv_bias, g)
    dop = _pad_axis(do, 0, b_p)
    lsep = _pad_axis(lse, 0, b_p)  # already [b, h, lq_p]
    deltap = _pad_axis(_pad_axis(delta, 2, lq_p), 0, b_p)
    kernel = functools.partial(
        _fmh_bwd_kernel, sm_scale=sm_scale, q_offset=q_offset, causal=causal,
        h=h, dh=dh, lq=lq, lkv=lkv,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b_p // g,),
        in_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, 1, lkv_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, h, lq_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, h, lq_p), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_p, lq, hdh), q.dtype),
            jax.ShapeDtypeStruct((b_p, lkv, hdh), k.dtype),
            jax.ShapeDtypeStruct((b_p, lkv, hdh), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b_p * h * lq_p * lkv_p * dh,
            bytes_accessed=4 * b_p * (2 * lq_p + 3 * lkv_p) * hdh,
            transcendentals=b_p * h * lq_p * lkv_p,
        ),
    )(qp, kp, vp, bias_p, dop, lsep, deltap)
    return dq[:b], dk[:b], dv[:b], None


fused_mh_band_attention.defvjp(_fmh_vjp_fwd, _fmh_vjp_bwd)


# ---------------------------------------------------------------------------
# Segmented-KV variant: keys/values arrive as SEPARATE (S, NS) segments.
#
# The ranking block's K/V are [shared-projection S rows ; dedicated-stack NS
# rows]; concatenating them costs a full-array HBM copy per tensor per layer
# (~1 ms/layer fwd+bwd at bench shapes — profiled, docs/PERF.md). These
# kernels take the two segments as separate refs and join them ONLY in VMEM:
# per head, logits are computed per segment, softmax runs over their
# concatenation, and the output is p_s·v_s + p_ns·v_ns. The NS segment
# (n=12 rows) needs no padding (block dim == array dim).
# Absolute positions: S keys at 0..Lkv−1, NS keys at Lkv..Lkv+n−1; queries
# at q_offset..q_offset+Lq−1 of the combined stream.
# ---------------------------------------------------------------------------


def _seg_bands(lq_p: int, lkv_p: int, n: int, lkv: int, q_offset: int,
               causal: bool):
    if not causal:
        return None, None
    band_s = _fused_band(lq_p, lkv_p, q_offset, causal)  # S keys at 0..lkv-1
    q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (lq_p, n), 0)
    ns_pos = lkv + jax.lax.broadcasted_iota(jnp.int32, (lq_p, n), 1)
    band_ns = jnp.where(ns_pos <= q_pos, 0.0, NEG_INF)
    return band_s, band_ns


def _fmhseg_fwd_kernel(
    q_ref, k_ref, v_ref, kns_ref, vns_ref, bias_ref, o_ref, lse_ref,
    *, sm_scale: float, q_offset: int, causal: bool,
    h: int, dh: int, lq: int, lkv: int,
):
    lq_p, lkv_p = q_ref.shape[1], k_ref.shape[1]
    n = kns_ref.shape[1]
    band_s, band_ns = _seg_bands(lq_p, lkv_p, n, lkv, q_offset, causal)
    q = _mask_rows(q_ref[:], 1, lq)
    k = _mask_rows(k_ref[:], 1, lkv)
    v = _mask_rows(v_ref[:], 1, lkv)
    kns, vns = kns_ref[:], vns_ref[:]
    bias = bias_ref[:][:, 0, :]  # [g, lkv_p] S-segment validity (padded)
    outs, lses = [], []
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        s1 = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], _BD_QKT,
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias[:, None, :]
        s2 = jax.lax.dot_general(
            q[:, :, sl], kns[:, :, sl], _BD_QKT,
            preferred_element_type=jnp.float32,
        ) * sm_scale
        if band_s is not None:
            s1 = s1 + band_s[None]
            s2 = s2 + band_ns[None]
        m = jnp.maximum(
            jnp.max(s1, axis=2, keepdims=True),
            jnp.max(s2, axis=2, keepdims=True),
        )
        p1 = jnp.exp(s1 - m)
        p2 = jnp.exp(s2 - m)
        l = jnp.sum(p1, axis=2, keepdims=True) + jnp.sum(p2, axis=2, keepdims=True)
        acc = jax.lax.dot_general(
            p1.astype(v.dtype), v[:, :, sl], _BD_PV,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            p2.astype(vns.dtype), vns[:, :, sl], _BD_PV,
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
        lses.append(m[:, :, 0] + jnp.log(jnp.maximum(l[:, :, 0], 1e-30)))
    o_ref[:] = jnp.concatenate(outs, axis=2)
    lse_ref[:] = jnp.stack(lses, axis=1)


def _fmhseg_bwd_kernel(
    q_ref, k_ref, v_ref, kns_ref, vns_ref, bias_ref, do_ref, lse_ref,
    delta_ref, dq_ref, dk_ref, dv_ref, dkns_ref, dvns_ref,
    *, sm_scale: float, q_offset: int, causal: bool,
    h: int, dh: int, lq: int, lkv: int,
):
    lq_p, lkv_p = q_ref.shape[1], k_ref.shape[1]
    n = kns_ref.shape[1]
    band_s, band_ns = _seg_bands(lq_p, lkv_p, n, lkv, q_offset, causal)
    q = _mask_rows(q_ref[:], 1, lq)
    k = _mask_rows(k_ref[:], 1, lkv)
    v = _mask_rows(v_ref[:], 1, lkv)
    do = _mask_rows(do_ref[:], 1, lq)
    kns, vns = kns_ref[:], vns_ref[:]
    lse, delta = lse_ref[:], delta_ref[:]
    bias = bias_ref[:][:, 0, :]
    dqs, dks, dvs, dkns, dvns = [], [], [], [], []
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        qh, kh, vh, doh = q[:, :, sl], k[:, :, sl], v[:, :, sl], do[:, :, sl]
        knsh, vnsh = kns[:, :, sl], vns[:, :, sl]
        s1 = jax.lax.dot_general(
            qh, kh, _BD_QKT, preferred_element_type=jnp.float32
        ) * sm_scale + bias[:, None, :]
        s2 = jax.lax.dot_general(
            qh, knsh, _BD_QKT, preferred_element_type=jnp.float32
        ) * sm_scale
        if band_s is not None:
            s1 = s1 + band_s[None]
            s2 = s2 + band_ns[None]
        lse_h = lse[:, i, :][:, :, None]
        p1 = jnp.exp(s1 - lse_h)
        p2 = jnp.exp(s2 - lse_h)
        if lq != lq_p:
            p1 = _mask_rows(p1, 1, lq)  # see _fused_bwd_kernel
            p2 = _mask_rows(p2, 1, lq)
        dvs.append(jax.lax.dot_general(
            p1.astype(doh.dtype), doh, _BD_PTDO,
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype))
        dvns.append(jax.lax.dot_general(
            p2.astype(doh.dtype), doh, _BD_PTDO,
            preferred_element_type=jnp.float32,
        ).astype(dvns_ref.dtype))
        dp1 = jax.lax.dot_general(
            doh, vh, _BD_QKT, preferred_element_type=jnp.float32
        )
        dp2 = jax.lax.dot_general(
            doh, vnsh, _BD_QKT, preferred_element_type=jnp.float32
        )
        delta_h = delta[:, i, :][:, :, None]
        ds1 = (p1 * (dp1 - delta_h) * sm_scale).astype(kh.dtype)
        ds2 = (p2 * (dp2 - delta_h) * sm_scale).astype(kh.dtype)
        dqs.append((jax.lax.dot_general(
            ds1, kh, _BD_PV, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            ds2, knsh, _BD_PV, preferred_element_type=jnp.float32
        )).astype(dq_ref.dtype))
        dks.append(jax.lax.dot_general(
            ds1, qh, _BD_PTDO, preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype))
        dkns.append(jax.lax.dot_general(
            ds2, qh, _BD_PTDO, preferred_element_type=jnp.float32
        ).astype(dkns_ref.dtype))
    dq_ref[:] = jnp.concatenate(dqs, axis=2)
    dk_ref[:] = jnp.concatenate(dks, axis=2)
    dv_ref[:] = jnp.concatenate(dvs, axis=2)
    dkns_ref[:] = jnp.concatenate(dkns, axis=2)
    dvns_ref[:] = jnp.concatenate(dvns, axis=2)


def _fmhseg_fwd_impl(q, k, v, kns, vns, s_bias, *, sm_scale, q_offset,
                     causal, h, g):
    b, lq, hdh = q.shape
    lkv = k.shape[1]
    n = kns.shape[1]
    dh = hdh // h
    qp, kp, vp, bias_p, b_p, lq_p, lkv_p = _fmh_prep(q, k, v, s_bias, g)
    knsp = _pad_axis(kns, 0, b_p)
    vnsp = _pad_axis(vns, 0, b_p)
    kernel = functools.partial(
        _fmhseg_fwd_kernel, sm_scale=sm_scale, q_offset=q_offset,
        causal=causal, h=h, dh=dh, lq=lq, lkv=lkv,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b_p // g,),
        in_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, n, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, n, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, 1, lkv_p), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, h, lq_p), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_p, lq, hdh), q.dtype),
            jax.ShapeDtypeStruct((b_p, h, lq_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_p * h * lq_p * (lkv_p + n) * dh,
            bytes_accessed=2 * b_p * (2 * lq_p + 2 * (lkv_p + n)) * hdh,
            transcendentals=b_p * h * lq_p * (lkv_p + n),
        ),
    )(qp, kp, vp, knsp, vnsp, bias_p)
    return out[:b], lse[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_mhseg_band_attention(
    q: jax.Array,   # [B, Lq, H·Dh] tail queries over the combined stream
    k: jax.Array,   # [B, Lkv, H·Dh] S segment
    v: jax.Array,
    kns: jax.Array,  # [B, n, H·Dh] NS segment (all valid)
    vns: jax.Array,
    s_bias: jax.Array,  # [B, Lkv] additive S validity (0 / -1e9)
    sm_scale: float,
    q_offset: int,
    causal: bool = True,
    h: int = 1,
    group: int = FUSED_GROUP,
) -> jax.Array:
    out, _ = _fmhseg_fwd_impl(
        q, k, v, kns, vns, s_bias, sm_scale=sm_scale, q_offset=q_offset,
        causal=causal, h=h, g=group,
    )
    return out


def _fmhseg_vjp_fwd(q, k, v, kns, vns, s_bias, sm_scale, q_offset, causal,
                    h, group):
    out, lse = _fmhseg_fwd_impl(
        q, k, v, kns, vns, s_bias, sm_scale=sm_scale, q_offset=q_offset,
        causal=causal, h=h, g=group,
    )
    return out, (q, k, v, kns, vns, s_bias, out, lse)


def _fmhseg_vjp_bwd(sm_scale, q_offset, causal, h, group, res, do):
    q, k, v, kns, vns, s_bias, out, lse = res
    b, lq, hdh = q.shape
    lkv = k.shape[1]
    n = kns.shape[1]
    dh = hdh // h
    g = group
    delta = jnp.sum(
        out.astype(jnp.float32).reshape(b, lq, h, dh)
        * do.astype(jnp.float32).reshape(b, lq, h, dh),
        axis=-1,
    ).transpose(0, 2, 1)
    qp, kp, vp, bias_p, b_p, lq_p, lkv_p = _fmh_prep(q, k, v, s_bias, g)
    knsp = _pad_axis(kns, 0, b_p)
    vnsp = _pad_axis(vns, 0, b_p)
    dop = _pad_axis(do, 0, b_p)
    lsep = _pad_axis(lse, 0, b_p)
    deltap = _pad_axis(_pad_axis(delta, 2, lq_p), 0, b_p)
    kernel = functools.partial(
        _fmhseg_bwd_kernel, sm_scale=sm_scale, q_offset=q_offset,
        causal=causal, h=h, dh=dh, lq=lq, lkv=lkv,
    )
    dq, dk, dv, dkns, dvns = pl.pallas_call(
        kernel,
        grid=(b_p // g,),
        in_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, n, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, n, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, 1, lkv_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, h, lq_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, h, lq_p), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, lq_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, lkv_p, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, n, hdh), lambda b: (b, 0, 0)),
            pl.BlockSpec((g, n, hdh), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_p, lq, hdh), q.dtype),
            jax.ShapeDtypeStruct((b_p, lkv, hdh), k.dtype),
            jax.ShapeDtypeStruct((b_p, lkv, hdh), v.dtype),
            jax.ShapeDtypeStruct((b_p, n, hdh), kns.dtype),
            jax.ShapeDtypeStruct((b_p, n, hdh), vns.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b_p * h * lq_p * (lkv_p + n) * dh,
            bytes_accessed=4 * b_p * (2 * lq_p + 3 * (lkv_p + n)) * hdh,
            transcendentals=b_p * h * lq_p * (lkv_p + n),
        ),
    )(qp, kp, vp, knsp, vnsp, bias_p, dop, lsep, deltap)
    return dq[:b], dk[:b], dv[:b], dkns[:b], dvns[:b], None


fused_mhseg_band_attention.defvjp(_fmhseg_vjp_fwd, _fmhseg_vjp_bwd)


def _fused_group_for(h: int, lq: int, lkv: int) -> int:
    """Largest grid group whose backward fits the ~16 MB Mosaic VMEM stack.

    The bwd kernels keep ≈8 f32 [lq_p, lkv_p]-sized temporaries live per
    batch row (s/p/dp/ds per segment + bands; measured: g=8,h=2 at
    192×384 needs 16.5 MB, g=2,h=3 at 368×652 needs 17.2 MB). Budget 13 MB
    to leave headroom for the bf16 input tiles.

    Returns 0 when even a SINGLE row's temporaries exceed the budget —
    callers must then fall back to the blocked flash path instead of
    dispatching the whole-tile kernel (which would fail Mosaic compilation;
    advisor round-3 item 2)."""
    lq_p = _round_up(lq, 16)
    lkv_p = _round_up(lkv, 128) + 128  # + NS segment / slack
    per_row = lq_p * lkv_p * 4 * 8
    g = max(1, FUSED_GROUP // h)
    while g > 1 and g * per_row > 13 * 2**20:
        g //= 2
    if g == 1 and per_row > 13 * 2**20:
        return 0
    return g


def flash_attention_bhld_segkv(
    q: jax.Array,    # [B, Lq, H, Dh] tail queries over the combined stream
    k_s: jax.Array,  # [B, Ls, H, Dh] S-segment keys
    v_s: jax.Array,
    k_ns: jax.Array,  # [B, n, H, Dh] NS-segment keys (all positions valid)
    v_ns: jax.Array,
    s_valid: jax.Array,  # [B, Ls] bool
    q_offset: int,
    causal: bool = True,
) -> jax.Array:
    """Segmented-KV model-layout wrapper. Falls back to concatenating the
    segments + `flash_attention_bhld` when the fused path doesn't apply
    (Dh not lane-aligned, or kv too long for the whole-tile kernel)."""
    b, lq, h, dh = q.shape
    ls, n = k_s.shape[1], k_ns.shape[1]
    sm_scale = 1.0 / float(dh) ** 0.5
    g = _fused_group_for(h, lq, ls + n)
    if ls + n <= FUSED_MAX_KV and dh % 128 == 0 and g >= 1:
        s_bias = jnp.where(s_valid, 0.0, NEG_INF).astype(jnp.float32)
        out = fused_mhseg_band_attention(
            q.reshape(b, lq, h * dh), k_s.reshape(b, ls, h * dh),
            v_s.reshape(b, ls, h * dh), k_ns.reshape(b, n, h * dh),
            v_ns.reshape(b, n, h * dh), s_bias, sm_scale, q_offset, causal,
            h, g,
        )
        return out.reshape(b, lq, h, dh).astype(q.dtype)
    kv_valid = jnp.concatenate(
        [s_valid, jnp.ones((b, n), dtype=bool)], axis=1
    )
    return flash_attention_bhld(
        q, jnp.concatenate([k_s, k_ns], axis=1),
        jnp.concatenate([v_s, v_ns], axis=1), kv_valid, q_offset, causal,
    )


def flash_attention_bhld(
    q: jax.Array,  # [B, Lq, H, Dh]  (model layout)
    k: jax.Array,  # [B, Lkv, H, Dh]
    v: jax.Array,
    kv_valid: jax.Array,  # [B, Lkv] bool
    q_offset: int,
    causal: bool = True,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Model-layout wrapper: collapses (B, H), transposes, and restores.

    Dispatches to the fused whole-tile kernel at small kv lengths (where it
    profiles ~3-4× faster than both XLA and the blocked kernel) and to the
    blocked online-softmax flash kernel for long sequences.
    """
    b, lq, h, dh = q.shape
    lkv = k.shape[1]
    sm_scale = 1.0 / float(dh) ** 0.5
    bias1 = jnp.where(kv_valid, 0.0, NEG_INF).astype(jnp.float32)  # [B, Lkv]

    g = _fused_group_for(h, lq, lkv)
    if lkv <= FUSED_MAX_KV and dh % 128 == 0 and g >= 1:
        # model-layout kernel: [B, L, H·Dh] with whole-lane per-head column
        # blocks — no swapaxes copies, no per-head bias materialization
        # group scales down with head count: each grid step does h heads'
        # worth of f32 scratch, and the backward's worst-case VMEM stack is
        # capped at 16 MB (g=8 × h=2 overflows it by 3%); g == 0 means even
        # one row busts the budget → blocked path below
        out = fused_mh_band_attention(
            q.reshape(b, lq, h * dh), k.reshape(b, lkv, h * dh),
            v.reshape(b, lkv, h * dh), bias1, sm_scale, q_offset, causal, h,
            g,
        )
        return out.reshape(b, lq, h, dh).astype(q.dtype)

    bias = jnp.broadcast_to(bias1[:, None, :], (b, h, lkv)).reshape(b * h, lkv)
    to_bh = lambda x: jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], dh)

    # bh layout: one head per grid row, so the VMEM budget is taken at h=1
    g_bh = _fused_group_for(1, lq, lkv)
    if lkv <= FUSED_MAX_KV and g_bh >= 1:
        out = fused_band_attention(
            to_bh(q), to_bh(k), to_bh(v), bias, sm_scale, q_offset, causal,
            group=g_bh,
        )
        return jnp.swapaxes(out.reshape(b, h, lq, dh), 1, 2).astype(q.dtype)

    def _pow2_block(n: int, cap: int) -> int:
        # power-of-two block sizes compile dramatically faster in mosaic than
        # odd multiples of 16 (e.g. 192/368 from rounding pyramid lengths)
        p = 16
        while p < n and p < cap:
            p *= 2
        return min(p, cap)

    bq = _pow2_block(lq, block_q)
    bk = _pow2_block(lkv, block_k)
    out = flash_band_attention(
        to_bh(q), to_bh(k), to_bh(v), bias, sm_scale, q_offset, causal, bq, bk
    )
    return jnp.swapaxes(out.reshape(b, h, lq, dh), 1, 2).astype(q.dtype)
