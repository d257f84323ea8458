import time
import numpy as np
print("[fo] importing jax...", flush=True)
import jax, jax.numpy as jnp
from jax import lax
print("[fo] dev:", jax.devices(), flush=True)
x = {"a": (np.random.rand(128,224,224,3)*255).astype(np.uint8)}
def t_put(tag):
    jax.block_until_ready(jax.device_put(x))
    t0=time.perf_counter()
    for _ in range(3): jax.block_until_ready(jax.device_put(x))
    dt=(time.perf_counter()-t0)/3
    print(f"[fo] {tag}: {dt*1e3:.0f} ms ({19.3/dt:.0f} MB/s)", flush=True)
t_put("fresh")
import sys; sys.path.insert(0, "/root/repo")
from vivqa_tpu.utils.seeding import enable_fast_prng
enable_fast_prng()
t_put("after enable_fast_prng")
a = jax.device_put(np.random.rand(2048,2048).astype(np.float32))
b = jax.device_put(np.random.rand(2048,2048).astype(np.float32))
g = jax.jit(lambda a,b: lax.fori_loop(0, 20, lambda i,v: jnp.tanh(v@b), a))
jax.block_until_ready(g(a,b))
for _ in range(3): jax.block_until_ready(g(a,b))
t_put("after chained-fori executions")
