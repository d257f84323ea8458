"""Tunnel health probe: time device init + one trivial compile + RTT.

The axon tunnel has slow periods where server-side compiles take 5-10x
longer; run this before launching a chunked TPU measurement to know
whether to wait. Prints one line."""
import sys
import time

t0 = time.perf_counter()
import jax
import jax.numpy as jnp

d = jax.devices()
t1 = time.perf_counter()
x = jnp.ones((256, 256))
y = jax.jit(lambda a: (a @ a).sum())(x)
float(y)
t2 = time.perf_counter()
lat = []
for _ in range(3):
    t = time.perf_counter()
    float(jax.jit(lambda a: a + 1.0)(jnp.float32(0.0)))
    lat.append(time.perf_counter() - t)
print(f"[tpu_ping] init={t1 - t0:.1f}s trivial_compile={t2 - t1:.1f}s "
      f"rtt~{min(lat) * 1e3:.0f}ms device={d[0].platform}x{len(d)}",
      flush=True)
