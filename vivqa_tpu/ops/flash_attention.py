"""Fused blocked (flash) attention — Pallas TPU kernels, fwd AND bwd.

The hot op of every encoder/fusion/decoder stack in this framework.
Computes softmax(QK^T/sqrt(d) + mask) V without materializing the
(Lq, Lk) attention matrix in HBM: K/V are streamed through VMEM in
blocks with the standard running-max/running-sum online softmax.

Forward = Pallas kernel (MXU matmuls on (blockQ, d) x (d, blockK) tiles,
fp32 accumulators) that also emits the per-row logsumexp. Backward =
flash-attention-2-style Pallas kernels: one pass over K-blocks producing
(dk, dv), one pass over Q-blocks producing dq, both re-deriving the
probabilities from the saved logsumexp (no (Lq, Lk) matrix ever touches
HBM in either direction). delta = rowsum(dO * O) is a cheap XLA
pre-pass. Short sequences keep the XLA-recompute VJP — at ViVQA lengths
(<= 256) XLA's fused recompute wins; the Pallas backward is the
long-sequence training path.

Falls back to a pure-XLA path off-TPU (CPU tests) or for shapes that
don't tile (block alignment).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:  # Pallas is TPU-only at runtime; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

NEG_INF = -1e30

# Set True in tests to run the kernel via the Pallas interpreter on CPU
# (numerics-identical, slow) — lets CI cover the kernel without a TPU.
_INTERPRET = False


def _xla_attention(q, k, v, mask=None, causal=False):
    """Reference implementation (also the backward path)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(d)
    if causal:
        Lq, Lk = logits.shape[-2], logits.shape[-1]
        cm = jnp.tril(jnp.ones((Lq, Lk), bool), Lk - Lq)
        logits = jnp.where(cm, logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, causal: bool,
                  sm_scale: float, q_offset: int):
    """One (blockQ, d) tile of queries vs all K/V blocks.

    Grid: (B*H, Lq // blockQ). K/V come in whole (Lk, d) — sliced
    per-iteration inside the kernel so the loop is a fori_loop over
    static-size dynamic slices.
    """
    q = q_ref[...].astype(jnp.float32) * sm_scale        # (bq, d)
    block_q, d = q.shape
    Lk = k_ref.shape[0]
    num_kb = Lk // block_k

    qi = pl.program_id(1)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        if causal:
            # q_offset = Lk - Lq aligns the causal diagonal to the END of
            # the key axis (same convention as _xla_attention's
            # tril(..., Lk - Lq)) so Lq != Lk calls agree with the
            # XLA fallback and the recomputed backward.
            q_pos = (q_offset + qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 0))
            k_pos = (kb * block_k
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 1))
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    if causal:
        # skip K/V blocks that are entirely in the masked future
        upper = jnp.minimum(num_kb,
                            (q_offset + (qi + 1) * block_q + block_k - 1)
                            // block_k)
    else:
        upper = num_kb
    acc, m, l = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, causal: bool, block_q: int, block_k: int):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)

    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               causal=causal, sm_scale=sm_scale,
                               q_offset=Lk - Lq)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Lk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Lk, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
        interpret=_INTERPRET,
    )(qf, kf, vf)
    return out.reshape(B, H, Lq, D)


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, m_out_ref, l_out_ref, *,
                      block_k: int, causal: bool, sm_scale: float,
                      q_offset: int):
    """Forward that also writes the per-row softmax stats (m, l).

    m and l are kept SEPARATE (not folded into lse = m + log l): for a
    fully-masked causal row m = -1e30 absorbs log(l) in f32, and the
    backward's p = exp(s - lse) would evaluate to 1 per key instead of
    the uniform 1/L the forward (and the XLA VJP) produce. With the raw
    stats the backward computes p = exp(s - m) / l, exact for masked and
    unmasked rows alike."""
    q = q_ref[...].astype(jnp.float32) * sm_scale
    block_q, d = q.shape
    Lk = k_ref.shape[0]
    num_kb = Lk // block_k
    qi = pl.program_id(1)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if causal:
            q_pos = (q_offset + qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 0))
            k_pos = (kb * block_k
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 1))
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    if causal:
        upper = jnp.minimum(num_kb,
                            (q_offset + (qi + 1) * block_q + block_k - 1)
                            // block_k)
    else:
        upper = num_kb
    acc, m, l = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[...] = (acc / l).astype(o_ref.dtype)
    m_out_ref[...] = m.astype(jnp.float32)
    l_out_ref[...] = l.astype(jnp.float32)


def _flash_forward_lse(q, k, v, causal, block_q, block_k):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)
    kernel = functools.partial(_flash_kernel_lse, block_k=block_k,
                               causal=causal, sm_scale=sm_scale,
                               q_offset=Lk - Lq)
    o, m, l = pl.pallas_call(
        kernel,
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Lk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Lk, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Lq, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(qf, kf, vf)
    return (o.reshape(B, H, Lq, D), m.reshape(B, H, Lq),
            l.reshape(B, H, Lq))


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
                          delta_ref, dk_ref, dv_ref, *, block_q: int,
                          causal: bool, sm_scale: float, q_offset: int):
    """One (block_k, d) tile of K/V vs all Q blocks -> (dk, dv) tile."""
    k = k_ref[...].astype(jnp.float32)                     # (bk, d)
    v = v_ref[...].astype(jnp.float32)
    block_k, d = k.shape
    Lq = q_ref.shape[0]
    num_qb = Lq // block_q
    kb = pl.program_id(1)

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        m = m_ref[pl.ds(qi * block_q, block_q), :]         # (bq, 1) f32
        l = l_ref[pl.ds(qi * block_q, block_q), :]
        delta = delta_ref[pl.ds(qi * block_q, block_q), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
        keep = None
        if causal:
            q_pos = (q_offset + qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 0))
            k_pos = (kb * block_k
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 1))
            keep = q_pos >= k_pos
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - m) / l                             # (bq, bk)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if keep is not None:
            # the forward's where() cuts d(logits) at masked entries:
            # ds is zero there even when p = 1/L (fully-masked rows,
            # which still contribute p to dv above — matching jax.vjp
            # through the XLA reference exactly)
            ds = jnp.where(keep, ds, 0.0)
        dk = dk + jnp.dot(ds.T, q,
                          preferred_element_type=jnp.float32) * sm_scale
        return dk, dv

    if causal:
        # skip Q blocks entirely in this K block's masked future
        lower = jnp.maximum(0, (kb * block_k - q_offset) // block_q)
    else:
        lower = 0
    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lower, num_qb, body, (dk0, dv0))
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
                         delta_ref, dq_ref, *, block_k: int, causal: bool,
                         sm_scale: float, q_offset: int):
    """One (block_q, d) tile of queries vs all K/V blocks -> dq tile."""
    q = q_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    m = m_ref[...]                                          # (bq, 1)
    l = l_ref[...]
    delta = delta_ref[...]
    block_q, d = q.shape
    Lk = k_ref.shape[0]
    num_kb = Lk // block_k
    qi = pl.program_id(1)

    def body(kb, dq):
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
        keep = None
        if causal:
            q_pos = (q_offset + qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 0))
            k_pos = (kb * block_k
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 1))
            keep = q_pos >= k_pos
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - m) / l
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if keep is not None:
            ds = jnp.where(keep, ds, 0.0)   # see dkv kernel comment
        return dq + jnp.dot(ds, k,
                            preferred_element_type=jnp.float32) * sm_scale

    if causal:
        upper = jnp.minimum(num_kb,
                            (q_offset + (qi + 1) * block_q + block_k - 1)
                            // block_k)
    else:
        upper = num_kb
    dq = jax.lax.fori_loop(0, upper, body,
                           jnp.zeros((block_q, d), jnp.float32))
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, m, l, g, causal, block_q, block_k):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(D)
    # delta_i = rowsum(dO_i * O_i) — cheap XLA pre-pass
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                                  # (B, H, Lq)
    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)
    gf = g.reshape(B * H, Lq, D)
    mf = m.reshape(B * H, Lq, 1)
    lf = l.reshape(B * H, Lq, 1)
    deltaf = delta.reshape(B * H, Lq, 1)
    q_offset = Lk - Lq

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                                   causal=causal, sm_scale=sm_scale,
                                   q_offset=q_offset)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B * H, Lk // block_k),
        in_specs=[
            pl.BlockSpec((None, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, Lq, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, Lq, 1), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, Lq, 1), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, Lq, 1), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lk, D), v.dtype),
        ],
        interpret=_INTERPRET,
    )(qf, kf, vf, gf, mf, lf, deltaf)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                                  causal=causal, sm_scale=sm_scale,
                                  q_offset=q_offset)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B * H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Lk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Lk, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, D), q.dtype),
        interpret=_INTERPRET,
    )(qf, kf, vf, gf, mf, lf, deltaf)

    return (dq.reshape(B, H, Lq, D), dk.reshape(B, H, Lk, D),
            dv.reshape(B, H, Lk, D))


def _pick_blocks(Lq: int, Lk: int):
    def pick(L):
        for b in (512, 256, 128):
            if L % b == 0:
                return b
        return None
    return pick(Lq), pick(Lk)


# Above this key length the backward ALSO runs as Pallas kernels (the
# flash-attention-2 dkv/dq passes); below it the XLA recompute VJP wins
# (small L -> XLA fuses the whole recompute, and the O(L^2) matrix is
# tiny anyway).
_PALLAS_BWD_MIN_LK = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, causal):
    bq, bk = _pick_blocks(q.shape[2], k.shape[2])
    return _flash_forward(q, k, v, causal, bq, bk)


def _flash_fwd(q, k, v, causal):
    bq, bk = _pick_blocks(q.shape[2], k.shape[2])
    if k.shape[2] >= _PALLAS_BWD_MIN_LK:
        # training path: forward emits the softmax stats the Pallas
        # backward needs (two extra (Lq,) f32 rows per head — negligible)
        o, m, l = _flash_forward_lse(q, k, v, causal, bq, bk)
        return o, (q, k, v, o, m, l)
    return _flash(q, k, v, causal), (q, k, v, None, None, None)


def _flash_bwd(causal, res, g):
    q, k, v, o, m, l = res
    if m is not None:
        bq, bk = _pick_blocks(q.shape[2], k.shape[2])
        return _flash_backward(q, k, v, o, m, l, g, causal, bq, bk)
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, causal=causal),
                     q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    causal: bool = False) -> jnp.ndarray:
    """(B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, D).

    Uses the Pallas kernel when on TPU with tileable shapes and no
    irregular mask; otherwise the XLA path (identical numerics).
    """
    on_tpu = jax.default_backend() == "tpu"
    bq, bk = _pick_blocks(q.shape[2], k.shape[2])
    # Measured on v5e: the kernel beats XLA's fused attention for causal
    # attention and for long sequences; short non-causal stays on XLA.
    worthwhile = causal or k.shape[2] >= 1024
    if (_HAS_PALLAS and on_tpu and mask is None and bq and bk and worthwhile
            and q.shape[-1] in (64, 128, 256)):
        return _flash(q, k, v, causal)
    return _xla_attention(q, k, v, mask, causal)
