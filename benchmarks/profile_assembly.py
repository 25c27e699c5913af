import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

E, F, ppc = 1976, 250, 9
rng = np.random.default_rng(0)
JtJ_pair = jnp.asarray(rng.normal(size=(E, 18, 18)).astype(np.float32))
sf = jnp.asarray(np.sort(rng.integers(0, F, E)).astype(np.int32))
tf = jnp.asarray(((np.asarray(sf) + 1 + rng.integers(0, F-1, E)) % F).astype(np.int32))

@jax.jit
def scatter_rows(JtJ_pair):
    off = jnp.arange(ppc)
    rows = jnp.concatenate([sf[:, None]*ppc + off, tf[:, None]*ppc + off], axis=1)
    Pn = F * ppc
    JtJ = jnp.zeros((Pn, Pn), jnp.float32)
    return JtJ.at[rows[:, :, None], rows[:, None, :]].add(JtJ_pair)

@jax.jit
def onehot_einsum(JtJ_pair):
    S = jax.nn.one_hot(sf, F, dtype=jnp.float32)  # (E, F)
    T = jax.nn.one_hot(tf, F, dtype=jnp.float32)
    W = jnp.stack([S, T], axis=1)  # (E, 2, F)
    B = JtJ_pair.reshape(E, 2, 9, 2, 9)
    out = jnp.einsum("euf,euavb,evg->fagb", W, B, W)
    return out.reshape(F*9, F*9)

@jax.jit
def onehot_chunked(JtJ_pair):
    S = jax.nn.one_hot(sf, F, dtype=jnp.float32)
    T = jax.nn.one_hot(tf, F, dtype=jnp.float32)
    W = jnp.stack([S, T], axis=1)             # (E, 2, F)
    B = JtJ_pair.reshape(E, 2, 9, 2, 9)
    CH = 247  # E = 8*247
    Wc = W.reshape(-1, CH, 2, F)
    Bc = B.reshape(-1, CH, 2, 9, 2, 9)
    def body(acc, xs):
        w, b = xs
        # (c,2,F),(c,2,9,2,9) -> (F,9,F,9)
        q = jnp.einsum("cuf,cuavb->cafvb", w, b)   # (c,F? no: (c,a,f?..
        out = jnp.einsum("cafvb,cvg->fagb", q, w)
        return acc + out, None
    acc0 = jnp.zeros((F, 9, F, 9), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (Wc, Bc))
    return acc.reshape(F*9, F*9)

def timed(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0=time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
        best = min(best, time.perf_counter()-t0)
    print(f"{name:20s} {best*1e3:8.1f} ms")
    return out

r1 = timed("scatter_rows", scatter_rows, JtJ_pair)
try:
    r2 = timed("onehot_einsum", onehot_einsum, JtJ_pair)
    print("parity:", float(jnp.abs(r1-r2).max()))
except Exception as e:
    print("onehot_einsum failed:", type(e).__name__, str(e)[:200])
try:
    r3 = timed("onehot_chunked", onehot_chunked, JtJ_pair)
    print("parity:", float(jnp.abs(r1-r3).max()))
except Exception as e:
    print("onehot_chunked failed:", type(e).__name__, str(e)[:200])
