"""Fused blocked (flash) attention — Pallas TPU kernel.

The hot op of every encoder/fusion/decoder stack in this framework.
Computes softmax(QK^T/sqrt(d) + mask) V without materializing the
(Lq, Lk) attention matrix in HBM: K/V are streamed through VMEM in
blocks with the standard running-max/running-sum online softmax.

Forward = Pallas kernel (MXU matmuls on (blockQ, d) x (d, blockK) tiles,
fp32 accumulators). Backward = custom VJP that recomputes attention with
plain XLA ops — at ViVQA sequence lengths (<= 256) the backward
recompute is cheap and XLA fuses it well; the kernel's win is the fused
forward for serving/eval and long-sequence headroom.

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


def _pick_blocks(Lq: int, Lk: int):
    def pick(L):
        for b in (512, 256, 128):
            if L % b == 0:
                return b
        return None
    return pick(Lq), pick(Lk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, causal):
    bq, bk = _pick_blocks(q.shape[2], k.shape[2])
    return _flash_forward(q, k, v, causal, bq, bk)


def _flash_fwd(q, k, v, causal):
    return _flash(q, k, v, causal), (q, k, v)


def _flash_bwd(causal, res, g):
    q, k, v = res
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
