import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
B, L, H, NH = 8192, 12, 768, 12
HD = H // NH
R = 24
rng = np.random.RandomState(0)
def timeit(fn, *args, n=3):
    out = fn(*args); jax.device_get(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.device_get(fn(*args)); ts.append(time.perf_counter()-t0)
    return round((min(ts)*1e3 - 30) / R, 2)

x = jnp.asarray(rng.rand(B, L, H), jnp.bfloat16)
wq = jnp.asarray(rng.rand(H, H), jnp.bfloat16) * 0.02
wk = jnp.asarray(rng.rand(H, H), jnp.bfloat16) * 0.02
wv = jnp.asarray(rng.rand(H, H), jnp.bfloat16) * 0.02
causal = np.zeros((L, L), np.float32); causal[np.triu_indices(L, 1)] = -1e9
bias4 = jnp.asarray(causal)[None, None]        # (1,1,L,L) for bhqk
biasv = jnp.asarray(causal)[None, :, :, None]  # (1,Lq,Lk,1) for bqkh

def v_current(c):
    q = jnp.dot(c, wq).reshape(B, L, NH, HD).transpose(0, 2, 1, 3)
    k = jnp.dot(c, wk).reshape(B, L, NH, HD).transpose(0, 2, 1, 3)
    v = jnp.dot(c, wv).reshape(B, L, NH, HD).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(HD).astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32) + bias4, axis=-1).astype(s.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, H)

def v_vpu(c):
    q = jnp.dot(c, wq).reshape(B, L, NH, HD)
    k = jnp.dot(c, wk).reshape(B, L, NH, HD)
    v = jnp.dot(c, wv).reshape(B, L, NH, HD)
    s = jnp.sum(q[:, :, None] * k[:, None, :], axis=-1)  # (B, Lq, Lk, NH)
    s = s / jnp.sqrt(HD).astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32) + biasv, axis=2).astype(s.dtype)
    ctx = jnp.sum(p[..., None] * v[:, None], axis=2)  # (B, Lq, NH, HD)
    return ctx.reshape(B, L, H)

a = jax.jit(v_current)(x); b = jax.jit(v_vpu)(x)
print("vpu maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)

for name, fn in [("current", v_current), ("vpu-style", v_vpu)]:
    f = jax.jit(lambda c, fn=fn: jnp.sum(lax.scan(lambda cc, _: (fn(cc), None), c, None, length=R)[0].astype(jnp.float32)))
    print(f"{name}: {timeit(f, x)} ms/iter", flush=True)
