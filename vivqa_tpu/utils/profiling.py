"""Device-time measurement utilities.

Timing jitted code correctly is subtle on remote-dispatch backends (the
axon TPU tunnel used in development): `block_until_ready` can return
before execution finishes, and any host round-trip costs a full tunnel
RTT (~25ms), so per-call python loops measure RTT, not device time.

The reliable recipe (calibrated against pure-matmul peak FLOPs):
1. chain N iterations inside ONE jitted `lax.fori_loop`,
2. force a HOST materialization (float()) as the barrier,
3. subtract the RTT floor measured with a trivial program.

`jax.profiler` trace hooks live in vivqa_tpu/train/trainer.py; this
module is the stopwatch the benchmarks (bench.py, bench_serving.py) and
perf tests build on.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def measure_rtt(probe_arg=None, repeats: int = 3) -> float:
    """Median host<->device round-trip for a trivial program (seconds)."""
    if probe_arg is None:
        probe_arg = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def trivial(x):
        return jnp.float32(1.0) + jax.tree.leaves(x)[0].reshape(-1)[0].astype(
            jnp.float32) * 0

    float(trivial(probe_arg))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(trivial(probe_arg))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_chained(fn: Callable, args: Sequence, steps: int = 20,
                 rtt: float | None = None) -> float:
    """Seconds per iteration of ``fn(*args) -> pytree`` measured by
    chaining `steps` calls inside one jitted fori_loop.

    The loop threads a scalar accumulator through every call (as a
    vanishing perturbation of the first argument) so iterations can't be
    CSE'd or dead-code-eliminated; the return reduces the FULL output so
    nothing is pruned.
    """
    first = args[0]

    @jax.jit
    def chained(*a):
        def body(i, acc):
            perturbed = jax.tree.map(
                lambda x: x + (acc * 1e-20).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a[0])
            out = fn(perturbed, *a[1:])
            s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                    for l in jax.tree.leaves(out))
            return acc + s * 1e-20 + 1.0
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

    float(chained(*args))  # compile + warmup
    if rtt is None:
        rtt = measure_rtt(first)
    t0 = time.perf_counter()
    float(chained(*args))
    total = time.perf_counter() - t0
    return max(total - rtt, 1e-9) / steps


def train_step_flops(train_step: Callable, state, batch) -> float | None:
    """FLOPs of ONE compiled train step, from XLA's cost analysis of the
    lowered executable (the honest count: includes fusion/remat effects,
    not an analytic paper formula). Returns None when the backend does
    not report cost analysis. Costs one extra compile."""
    try:
        c = jax.jit(train_step).lower(state, batch).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


_PEAK_TFLOPS_BF16 = (  # device_kind substring -> peak dense bf16 TFLOP/s
    ("v6", 918.0), ("trillium", 918.0), ("v5p", 459.0),
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0), ("v3", 123.0), ("v2", 45.0))


def peak_tflops(device=None) -> float | None:
    """Best-effort peak dense bf16 TFLOP/s for the attached chip (None
    if unrecognized). Override precedence belongs to the caller."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_TFLOPS_BF16:
        if sub in kind:
            return peak
    return None


def time_train_steps(train_step: Callable, state, batch,
                     steps: int = 20, rtt: float | None = None,
                     repeats: int = 3) -> float:
    """Seconds per training step: chains `steps` state updates inside one
    jit (state threads through, so steps serialize exactly like a real
    loop) with a host barrier on the final step counter.

    The compiled program is measured `repeats` times and the MEDIAN
    window is returned (one compile, N cheap measurements) — single
    windows show ~2-3% run-to-run variance on the shared tunnel."""

    @jax.jit
    def many(state, batch):
        def body(_, s):
            s2, _m = train_step(s, batch)
            return s2
        final = jax.lax.fori_loop(0, steps, body, state)
        # The barrier must consume EVERY param leaf: XLA dead-code
        # eliminates loop-carry components that don't feed the output
        # (a step-counter-only marker lets the whole model update be
        # pruned — observed as impossible 240k steps/s).
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(final.params))

    float(many(state, batch))  # compile + warmup
    if rtt is None:
        rtt = measure_rtt(batch)
    windows = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        float(many(state, batch))
        windows.append(time.perf_counter() - t0)
    windows.sort()
    total = windows[len(windows) // 2]
    return max(total - rtt, 1e-9) / steps
