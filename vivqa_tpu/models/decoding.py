"""KV-cached autoregressive decoding: greedy / top-k / top-p / beam search.

This replaces the reference's generation loop
(src/modeling/meta_arch/generative_vqa_model.py:599-703), which re-runs
the full decoder stack on the growing sequence every step (no KV cache)
and silently ignores its `num_beams` argument. Here:

- the whole generation loop is ONE device `lax.while_loop` inside jit
  (static max-length, no host round-trips). `early_exit=True` (default)
  exits as soon as no output can change (all rows EOS'd / no live beam
  can beat the worst finished beam — output-identical, ~6x fewer steps
  on real 1-5-token answers); `early_exit=False` keeps the fixed trip
  count (benchmarks: fixed work per call). Both modes share the ONE
  while_loop program: the scan/fori_loop forms of the same body
  deterministically miscompile on the axon TPU runtime (see the notes
  at the loops + tools/probe_decode_identity.py);
- every step is O(1) decoder work thanks to the flax decode cache;
- beam search is a real batched implementation (t5x-style): beams are
  folded into the batch dimension, the cache is gathered when beams are
  reordered, EOS'd beams move to a finished pool with Google-NMT length
  penalty (alpha).

All functions take `apply_fn(cache, token) -> (logits, new_cache)` plus
the initial cache, so they are model-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    max_length: int = 64
    bos_token_id: int = 0
    eos_token_id: int = 2
    pad_token_id: int = 1
    strategy: str = "greedy"        # greedy | top_k | top_p | beam
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 0.9
    num_beams: int = 4
    length_penalty: float = 0.6     # Google-NMT alpha
    # Stop the device loop as soon as no output can change: all rows
    # EOS'd (greedy/sampling), or no live beam can still beat the worst
    # finished beam (beam). Output-identical to the full loop — real
    # answers are 1-5 tokens vs max_length 32, so serving decode exits
    # ~6x earlier. False = fixed-trip lax.scan/fori (benchmarking).
    early_exit: bool = True


def _sample_logits(logits, rng, cfg: DecodeConfig):
    """Apply temperature + top-k/top-p filtering, then sample or argmax."""
    if cfg.strategy == "greedy":
        return jnp.argmax(logits, axis=-1)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.strategy == "top_k":
        k = min(cfg.top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    elif cfg.strategy == "top_p":
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep 1st)
        cutoff_mask = cum - probs > cfg.top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff_logit, NEG_INF, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def autoregressive_decode(apply_fn: Callable, cache: Any, batch_size: int,
                          cfg: DecodeConfig, rng: jax.Array | None = None):
    """Greedy / top-k / top-p decode as a single lax.scan.

    Returns (sequences (B, max_length) int32, scores (B,) summed logprobs).
    Sequences start with the first *generated* token (BOS not included);
    positions after EOS are filled with pad.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    bos = jnp.full((batch_size, 1), cfg.bos_token_id, jnp.int32)

    def advance(tokens, cache, done, score, rng):
        logits, cache = apply_fn(cache, tokens)
        rng, sub = jax.random.split(rng)
        nxt = _sample_logits(logits, sub, cfg).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        score = score + jnp.where(done, 0.0, tok_logp)
        done = done | (nxt == cfg.eos_token_id)
        return nxt, cache, done, score, rng

    init_done = jnp.zeros((batch_size,), bool)
    init_score = jnp.zeros((batch_size,), jnp.float32)

    # BOTH modes run the same lax.while_loop program; early_exit only
    # adds the all-rows-done term to the predicate (output-identical —
    # pads thereafter are prefilled). This is deliberate: the fixed-trip
    # constructs (lax.scan / fori_loop) of the identical body DETERMIN-
    # ISTICALLY MISCOMPILE on the axon TPU runtime — NaN scores and
    # zeroed alternating batch rows from step 0, reproduced across
    # processes/compiles, while the same program is bit-exact on CPU and
    # the while_loop form is bit-exact on both (tools/
    # probe_decode_identity.py, fitted flagship checkpoint). Keeping one
    # loop construct makes fixed/early identity structural AND avoids
    # the miscompiled program shape.
    seqs0 = jnp.full((batch_size, cfg.max_length), cfg.pad_token_id,
                     jnp.int32)

    def cond(state):
        t, done, score = state[0], state[4], state[5]
        in_range = t < cfg.max_length
        if not cfg.early_exit:
            # ALWAYS-TRUE data-dependent term (scores are bounded far
            # above -1e30): makes the trip count opaque to XLA so the
            # fixed mode compiles to the SAME program structure as the
            # early mode. A counter-only predicate lets XLA treat the
            # loop as fixed-trip, which MISCOMPILES on the axon TPU
            # runtime (garbage from step 0; see module note +
            # tools/probe_decode_identity.py).
            return in_range & (jnp.min(score) > -1e30)
        return in_range & ~jnp.all(done)

    def body(state):
        t, tokens, cache, seqs, done, score, rng = state
        nxt, cache, done, score, rng = advance(tokens, cache, done,
                                               score, rng)
        seqs = jax.lax.dynamic_update_slice_in_dim(seqs, nxt[:, None], t,
                                                   axis=1)
        return (t + 1, nxt[:, None], cache, seqs, done, score, rng)

    state = (jnp.int32(0), bos, cache, seqs0, init_done, init_score, rng)
    state = jax.lax.while_loop(cond, body, state)
    return state[3], state[5]                      # (B, L), (B,)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def _gather_beams(tree, beam_idx, batch_size, num_beams):
    """Gather along the folded (batch*beam) axis. beam_idx: (B, K) in [0,K).

    Beam-INVARIANT cache entries are skipped: the cached cross-attention
    K/V ('cached_ckey'/'cached_cvalue', layers.CachedCrossAttention) and
    scalar position counters are identical across the beams of a row, so
    reordering them is an identity — and a expensive one (at ViVQA memory
    lengths the cross K/V are the largest tensors in the cache; gathering
    them every step measurably dominated the beam step)."""
    def gather(path, x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        if any("cached_ck" in str(getattr(k, "key", k)) or
               "cached_cv" in str(getattr(k, "key", k)) for k in path):
            return x
        unflat = x.reshape((batch_size, num_beams) + x.shape[1:])
        out = jnp.take_along_axis(
            unflat, beam_idx.reshape((batch_size, num_beams) +
                                     (1,) * (x.ndim - 1)), axis=1)
        return out.reshape(x.shape)
    return jax.tree_util.tree_map_with_path(gather, tree)


def _length_penalty(length, alpha):
    return jnp.power((5.0 + length) / 6.0, alpha)


def beam_search(apply_fn: Callable, cache: Any, batch_size: int,
                cfg: DecodeConfig):
    """Batched beam search with KV-cache reordering.

    `cache` must already be tiled to batch*num_beams (tile memory and
    cache with `tile_for_beams` before calling). Returns
    (sequences (B, max_length), scores (B,)) for the best finished beam
    (or best live beam if none finished).
    """
    K, L = cfg.num_beams, cfg.max_length
    BK = batch_size * K

    live_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1)), (batch_size, 1))   # (B, K)
    live_seqs = jnp.full((batch_size, K, L), cfg.pad_token_id, jnp.int32)
    fin_scores = jnp.full((batch_size, K), NEG_INF)
    fin_seqs = jnp.full((batch_size, K, L), cfg.pad_token_id, jnp.int32)
    tokens = jnp.full((BK, 1), cfg.bos_token_id, jnp.int32)

    def step(t, state):
        tokens, cache, live_seqs, live_scores, fin_seqs, fin_scores = state
        logits, cache = apply_fn(cache, tokens)            # (BK, V)
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(batch_size, K, V)
        cand = live_scores[..., None] + logp               # (B, K, V)

        # Two-stage top-k: the global top-2K always lies within each
        # beam's own top-2K, so first reduce per beam over the vocab
        # (K parallel rows of width V), then over the K*2K survivors.
        # One top-k over the flat (K*V)-wide axis (256k for a 64k vocab
        # at beam 4) was the step-time bottleneck at serving batch sizes.
        s1_scores, s1_tok = jax.lax.top_k(
            cand.reshape(BK, V), 2 * K)                    # (BK, 2K)
        s1_scores = s1_scores.reshape(batch_size, K, 2 * K)
        s1_tok = s1_tok.reshape(batch_size, K, 2 * K)
        flat = s1_scores.reshape(batch_size, K * 2 * K)
        top_scores, flat_idx = jax.lax.top_k(flat, 2 * K)  # (B, 2K)
        top_beam = flat_idx // (2 * K)
        top_tok = jnp.take_along_axis(
            s1_tok.reshape(batch_size, K * 2 * K), flat_idx,
            axis=1).astype(jnp.int32)

        # Build 2K candidate sequences
        cand_seqs = jnp.take_along_axis(
            live_seqs, top_beam[..., None], axis=1)        # (B, 2K, L)
        cand_seqs = cand_seqs.at[:, :, t].set(top_tok)
        is_eos = top_tok == cfg.eos_token_id

        # Finished pool update: EOS candidates with length penalty
        pen = _length_penalty(t + 1, cfg.length_penalty)
        cand_fin_scores = jnp.where(is_eos, top_scores / pen, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        all_fin_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, K)
        fin_seqs_new = jnp.take_along_axis(
            all_fin_seqs, fin_idx[..., None], axis=1)

        # Live beams: best K non-EOS candidates
        live_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        live_top, live_idx = jax.lax.top_k(live_cand_scores, K)   # (B, K)
        new_live_seqs = jnp.take_along_axis(
            cand_seqs, live_idx[..., None], axis=1)
        new_beam_idx = jnp.take_along_axis(top_beam, live_idx, axis=1)
        new_tokens = jnp.take_along_axis(top_tok, live_idx, axis=1)

        cache = _gather_beams(cache, new_beam_idx, batch_size, K)
        return (new_tokens.reshape(BK, 1), cache, new_live_seqs, live_top,
                fin_seqs_new, fin_top)

    state = (tokens, cache, live_seqs, live_scores, fin_seqs, fin_scores)
    # BOTH modes run the same lax.while_loop program (see the identical
    # note in autoregressive_decode: the fori_loop form of this body
    # deterministically miscompiles on the axon TPU runtime — every
    # returned beam collapsed to an immediate-EOS hypothesis with NaN
    # score, while the while_loop form matches the CPU decode bit-exactly;
    # tools/probe_decode_identity.py).
    #
    # Early exit (t5x-style bound): raw log-prob scores only fall as
    # beams extend, and the Google-NMT penalty is largest at length
    # L — so live_score / penalty(L) is the best penalized score any
    # live beam can still reach. Once, in every batch row, that
    # bound cannot beat the row's K-th finished score, later steps
    # cannot change the output, and the loop stops.
    # Penalty is monotone in length; raw scores are <= 0, so the
    # best achievable penalized score divides by the LARGEST future
    # penalty: penalty(L) for alpha >= 0, penalty(1) == 1 for
    # alpha < 0 — max of the two covers both signs.
    pen_max = max(((5.0 + L) / 6.0) ** cfg.length_penalty, 1.0)

    def w_cond(s):
        t = s[0]
        in_range = t < L
        _, _, _, live_scores_t, _, fin_scores_t = s[1]
        if not cfg.early_exit:
            # always-true data-dependent term — keeps the trip count
            # opaque (live scores are bounded far above -1e30); a
            # counter-only predicate miscompiles on axon (see
            # autoregressive_decode's cond note)
            return in_range & (jnp.max(live_scores_t) > -1e30)
        bound = live_scores_t[:, 0] / pen_max
        improvable = bound > fin_scores_t[:, -1]
        return in_range & jnp.any(improvable)

    def w_body(s):
        t = s[0]
        return (t + 1, step(t, s[1]))

    state = jax.lax.while_loop(w_cond, w_body,
                               (jnp.int32(0), state))[1]
    _, _, live_seqs, live_scores, fin_seqs, fin_scores = state

    # Fall back to best live beam if nothing finished.
    none_finished = jnp.all(fin_scores <= NEG_INF / 2, axis=1)
    live_pen = live_scores / _length_penalty(L, cfg.length_penalty)
    best_fin = jnp.argmax(fin_scores, axis=1)
    best_live = jnp.argmax(live_pen, axis=1)
    seqs = jnp.where(none_finished[:, None],
                     jnp.take_along_axis(live_seqs,
                                         best_live[:, None, None], 1)[:, 0],
                     jnp.take_along_axis(fin_seqs,
                                         best_fin[:, None, None], 1)[:, 0])
    scores = jnp.where(none_finished,
                       jnp.take_along_axis(live_pen, best_live[:, None], 1)[:, 0],
                       jnp.take_along_axis(fin_scores, best_fin[:, None], 1)[:, 0])
    return seqs, scores


def tile_for_beams(tree, num_beams: int):
    """Repeat every leaf along axis 0: (B, ...) -> (B*K, ...)."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, num_beams, axis=0)
        if hasattr(x, "shape") and x.ndim > 0 else x, tree)


# ---------------------------------------------------------------------------
# Model-level generate
# ---------------------------------------------------------------------------

def build_generate_fn(model, cfg: DecodeConfig):
    """Returns a jittable generate(params, pixel_values, question_ids,
    question_mask, rng) -> (sequences, scores) for a GenerativeVQAModel."""

    def init_cache(params, memory, memory_mask):
        B = memory.shape[0]
        _, vars_ = model.apply(
            {"params": params},
            jnp.zeros((B, cfg.max_length), jnp.int32), memory, memory_mask,
            method=model.decode_step_full, mutable=["cache"])
        return vars_["cache"]

    def generate(params, pixel_values, question_ids, question_mask=None,
                 rng=None, knowledge_embeddings=None, knowledge_mask=None,
                 expert_mask=None):
        # expert_mask must reach the fusion MoE here too: ablation
        # experiments train WITH the mask, so generate-then-score
        # validation (and any inference on an ablated model) has to
        # decode with the same expert composition
        enc = model.apply({"params": params}, pixel_values, question_ids,
                          question_mask, expert_mask, knowledge_embeddings,
                          knowledge_mask, method=model.encode)
        memory, memory_mask = enc["memory"], enc["memory_mask"]
        B = memory.shape[0]

        if cfg.strategy == "beam":
            memory = jnp.repeat(memory, cfg.num_beams, axis=0)
            memory_mask = jnp.repeat(memory_mask, cfg.num_beams, axis=0)

        cache = init_cache(params, memory, memory_mask)

        def apply_fn(cache, tokens):
            logits, vars_ = model.apply(
                {"params": params, "cache": cache}, tokens, memory,
                memory_mask, method=model.decode_step, mutable=["cache"])
            return logits, vars_["cache"]

        if cfg.strategy == "beam":
            return beam_search(apply_fn, cache, B, cfg)
        return autoregressive_decode(apply_fn, cache, B, cfg, rng)

    return generate
