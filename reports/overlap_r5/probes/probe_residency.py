import time
import numpy as np
print("[res] importing jax...", flush=True)
import jax, jax.numpy as jnp
print("[res] dev:", jax.devices(), flush=True)
x = {"a": (np.random.rand(128,224,224,3)*255).astype(np.uint8)}
def t_put(tag):
    jax.block_until_ready(jax.device_put(x))
    t0=time.perf_counter()
    for _ in range(3): jax.block_until_ready(jax.device_put(x))
    dt=(time.perf_counter()-t0)/3
    print(f"[res] {tag}: {dt*1e3:.0f} ms ({19.3/dt:.0f} MB/s)", flush=True)
t_put("fresh")
# allocate ~700 MB resident
res = [jax.device_put(np.random.rand(1024,1024,64).astype(np.float32)) for _ in range(3)]
jax.block_until_ready(res)
t_put("after 800MB resident")
# run a decently-big jitted program a few times
f = jax.jit(lambda a,b: jnp.tanh(a@b))
a = jax.device_put(np.random.rand(4096,4096).astype(np.float32)); b = jax.device_put(np.random.rand(4096,4096).astype(np.float32))
for _ in range(5): a = f(a,b)
jax.block_until_ready(a)
t_put("after big jit executions")
del res
t_put("after freeing residency")
