import threading, time, queue
import numpy as np
print("[probe] importing jax...", flush=True)
import jax
print("[probe] dev:", jax.devices(), flush=True)
x = {"a": (np.random.rand(128,224,224,3)*255).astype(np.uint8),
     "b": np.random.rand(128,64).astype(np.float32)}
mb = sum(v.nbytes for v in x.values())/1e6
jax.block_until_ready(jax.device_put(x))
t0=time.perf_counter()
for _ in range(3): jax.block_until_ready(jax.device_put(x))
print(f"[probe] main-thread: {(time.perf_counter()-t0)/3*1e3:.0f} ms ({mb:.1f} MB)", flush=True)
q = queue.Queue()
def w():
    for _ in range(3):
        t0=time.perf_counter()
        jax.block_until_ready(jax.device_put(x))
        q.put(time.perf_counter()-t0)
th = threading.Thread(target=w); th.start(); th.join()
ts=[q.get() for _ in range(3)]
print(f"[probe] worker-thread: {sum(ts)/3*1e3:.0f} ms", flush=True)
# concurrent: main thread spins tiny device ops while worker uploads
import jax.numpy as jnp
y = jax.device_put(np.random.rand(256,256).astype(np.float32))
f = jax.jit(lambda v: (v@v).sum())
float(f(y))
done=threading.Event(); res={}
def w2():
    t0=time.perf_counter()
    jax.block_until_ready(jax.device_put(x))
    res["t"]=time.perf_counter()-t0; done.set()
th=threading.Thread(target=w2); n=0; t0=time.perf_counter(); th.start()
while not done.is_set():
    float(f(y)); n+=1
th.join()
print(f"[probe] worker upload under main-thread traffic: {res['t']*1e3:.0f} ms; main did {n} small ops", flush=True)
