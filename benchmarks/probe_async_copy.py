import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

x = jnp.asarray(np.random.rand(64, 1024).astype(np.float32))
f = jax.jit(lambda a: (a @ a.T, jnp.tanh(a)))
outs = f(x); jax.device_get(outs)  # warm

# A: plain blocking device_get after dispatch + host work
def run(async_copy, host_ms=30):
    t0 = time.perf_counter()
    outs = f(x)
    if async_copy:
        for o in jax.tree.leaves(outs):
            try:
                o.copy_to_host_async()
            except Exception as e:
                print("copy_to_host_async failed:", e); return None
    te = time.perf_counter()
    while time.perf_counter() - te < host_ms/1000: pass  # simulate host work
    r = jax.device_get(outs)
    return (time.perf_counter() - t0)*1e3

for mode in (False, True):
    ts = [run(mode) for _ in range(5)]
    print("async" if mode else "block", [f"{t:.1f}" for t in ts])
