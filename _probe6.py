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

# block-diagonal merged-head: rows = (head, pos), block mask keeps head-local attention
NL = NH * L
block = np.full((NL, NL), -1e9, np.float32)
for h in range(NH):
    block[h*L:(h+1)*L, h*L:(h+1)*L] = causal
block = jnp.asarray(block)

def v_blockdiag(c):
    q = jnp.dot(c, wq).reshape(B, L, NH, HD).transpose(0, 2, 1, 3).reshape(B, NL, HD)
    k = jnp.dot(c, wk).reshape(B, L, NH, HD).transpose(0, 2, 1, 3).reshape(B, NL, HD)
    v = jnp.dot(c, wv).reshape(B, L, NH, HD).transpose(0, 2, 1, 3).reshape(B, NL, HD)
    s = jnp.einsum("bnd,bmd->bnm", q, k) / jnp.sqrt(HD).astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32) + block, axis=-1).astype(s.dtype)
    ctx = jnp.einsum("bnm,bmd->bnd", p, v)
    return ctx.reshape(B, NH, L, HD).transpose(0, 2, 1, 3).reshape(B, L, H)

bias4 = jnp.asarray(causal)[None, None]
def v_current(c):
    q = jnp.dot(c, wq).reshape(B, L, NH, HD).transpose(0, 2, 1, 3)
    k = jnp.dot(c, wk).reshape(B, L, NH, HD).transpose(0, 2, 1, 3)
    v = jnp.dot(c, wv).reshape(B, L, NH, HD).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(HD).astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32) + bias4, axis=-1).astype(s.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, H)

# correctness check first (f32 tolerance in bf16)
a = jax.jit(v_current)(x); b = jax.jit(v_blockdiag)(x)
print("blockdiag maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)

for name, fn in [("current", v_current), ("blockdiag", v_blockdiag)]:
    f = jax.jit(lambda c, fn=fn: jnp.sum(lax.scan(lambda cc, _: (fn(cc), None), c, None, length=R)[0].astype(jnp.float32)))
    print(f"{name}: {timeit(f, x)} ms/iter", flush=True)
