import time
import numpy as np
print("[bx] importing jax...", flush=True)
import jax, jax.numpy as jnp
print("[bx] dev:", jax.devices(), flush=True)
B = {"px": (np.random.rand(128,224,224,3)*255).astype(np.uint8)}
# params: 48 distinct 1024x1024 mats (~200 MB) -> a big executable with many args
P = [jax.device_put(np.random.rand(1024,1024).astype(np.float32)) for _ in range(48)]
@jax.jit
def step(P, b):
    x = b["px"].astype(jnp.float32).reshape(128, -1)[:, :1024]
    for w in P:
        x = jnp.tanh(x @ w)
    return x.sum()
db = jax.device_put(B)
r = step(P, db); jax.block_until_ready(r)
t0=time.perf_counter()
for _ in range(5): r = step(P, db)
jax.block_until_ready(r)
print(f"[bx] big-exec + SAME batch: {(time.perf_counter()-t0)/5*1e3:.0f} ms/step", flush=True)
t0=time.perf_counter()
for _ in range(5): r = step(P, jax.device_put(B))
jax.block_until_ready(r)
print(f"[bx] big-exec + NEW batch: {(time.perf_counter()-t0)/5*1e3:.0f} ms/step", flush=True)
