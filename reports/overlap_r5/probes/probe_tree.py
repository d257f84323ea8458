import time
import numpy as np
print("[tr] importing jax...", flush=True)
import jax, jax.numpy as jnp
print("[tr] dev:", jax.devices(), flush=True)
B = {"px": (np.random.rand(128,224,224,3)*255).astype(np.uint8)}
state = {f"p{i}": jax.device_put(np.random.rand(256,256).astype(np.float32))
         for i in range(1000)}   # 1000 leaves, ~260 MB
@jax.jit
def step(state, b):
    x = b["px"].astype(jnp.float32).sum()*1e-12
    return {k: v + x for k, v in state.items()}
sf = jax.jit(step, donate_argnums=(0,))
db = jax.device_put(B)
state = sf(state, db); jax.block_until_ready(state)
t0=time.perf_counter()
for _ in range(5): state = sf(state, db)
jax.block_until_ready(state)
print(f"[tr] 1000-leaf donated + SAME batch: {(time.perf_counter()-t0)/5*1e3:.0f} ms/step", flush=True)
t0=time.perf_counter()
for _ in range(5): state = sf(state, jax.device_put(B))
jax.block_until_ready(state)
print(f"[tr] 1000-leaf donated + NEW batch: {(time.perf_counter()-t0)/5*1e3:.0f} ms/step", flush=True)
