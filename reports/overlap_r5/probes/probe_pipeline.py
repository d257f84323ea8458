import threading, time, queue, itertools
import numpy as np
print("[pp] importing jax...", flush=True)
import jax, jax.numpy as jnp
print("[pp] dev:", jax.devices(), flush=True)
B = {"px": (np.random.rand(128,224,224,3)*255).astype(np.uint8),
     "ids": np.random.rand(128,64).astype(np.float32)}
W = np.random.rand(64,64).astype(np.float32)
w = jax.device_put(W)
@jax.jit
def step(w, b):
    x = b["px"].astype(jnp.float32).mean(axis=(1,2))   # touch the big array
    return w + 1e-6*(b["ids"].T @ b["ids"])[:64,:64] + x.sum()*1e-9
w = step(w, jax.device_put(B)); jax.block_until_ready(w)

def feed(n):
    q = queue.Queue(maxsize=2)
    def worker():
        for _ in range(n):
            q.put(jax.device_put(B))
        q.put(None)
    threading.Thread(target=worker, daemon=True).start()
    while True:
        it = q.get()
        if it is None: return
        yield it

# pattern A: prefetch-fed, no per-step barrier (bench_overlap's shape)
t0=time.perf_counter(); n=0
for b in feed(8):
    w = step(w, b); n+=1
jax.block_until_ready(w)
print(f"[pp] A prefetch-fed: {(time.perf_counter()-t0)/n*1e3:.0f} ms/step", flush=True)
# pattern B: main-thread synchronous put per step (no worker thread)
t0=time.perf_counter()
for _ in range(8):
    w = step(w, jax.device_put(B))
jax.block_until_ready(w)
print(f"[pp] B main-thread put: {(time.perf_counter()-t0)/8*1e3:.0f} ms/step", flush=True)
# pattern C: same buffer reused (no upload at all)
db = jax.device_put(B)
t0=time.perf_counter()
for _ in range(8):
    w = step(w, db)
jax.block_until_ready(w)
print(f"[pp] C staged buffer: {(time.perf_counter()-t0)/8*1e3:.0f} ms/step", flush=True)
