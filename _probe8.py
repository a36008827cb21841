import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
rng = np.random.RandomState(0)
def timeit(fn, *args, n=3, R=1):
    out = fn(*args); jax.device_get(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.device_get(fn(*args)); ts.append(time.perf_counter()-t0)
    return round((min(ts)*1e3 - 30) / R, 2)

# (a) grouped cross-attention: current vs vpu
B, L, KB, LQ, H, NH = 8192, 12, 32, 80, 768, 12
HD = H // NH
G = B // KB
R = 24
x = jnp.asarray(rng.rand(B, L, H), jnp.bfloat16)
qs = jnp.asarray(rng.rand(KB, LQ, H), jnp.bfloat16)
wq = jnp.asarray(rng.rand(H, H), jnp.bfloat16) * 0.02
wk = jnp.asarray(rng.rand(H, H), jnp.bfloat16) * 0.02
wv = jnp.asarray(rng.rand(H, H), jnp.bfloat16) * 0.02

def c_current(c):
    q = jnp.dot(c, wq)
    k = jnp.dot(qs, wk).reshape(KB, LQ, NH, HD).transpose(0, 2, 1, 3)
    v = jnp.dot(qs, wv).reshape(KB, LQ, NH, HD).transpose(0, 2, 1, 3)
    q2 = q.reshape(KB, G * L, NH, HD).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q2, k) / jnp.sqrt(HD).astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(s.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, H)

def c_vpu(c):
    q = jnp.dot(c, wq).reshape(KB, G * L, NH, HD)
    k = jnp.dot(qs, wk).reshape(KB, LQ, NH, HD)
    v = jnp.dot(qs, wv).reshape(KB, LQ, NH, HD)
    s = jnp.sum(q[:, :, None] * k[:, None], axis=-1) / jnp.sqrt(HD).astype(q.dtype)  # (KB, GL, LQ, NH)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=2).astype(s.dtype)
    ctx = jnp.sum(p[..., None] * v[:, None], axis=2)  # (KB, GL, NH, HD)
    return ctx.reshape(B, L, H)

a = jax.jit(c_current)(x); b = jax.jit(c_vpu)(x)
print("cross vpu maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))), flush=True)
for name, fn in [("cross-current", c_current), ("cross-vpu", c_vpu)]:
    f = jax.jit(lambda c, fn=fn: jnp.sum(lax.scan(lambda cc, _: (fn(cc), None), c, None, length=R)[0].astype(jnp.float32)))
    print(f"{name}: {timeit(f, x, R=R)} ms/iter", flush=True)

# (b) ViT-B/480 block breakdown
from bridgeqa_tpu.models.vit import create_vit
vit, width = create_vit("base", 480, drop_path_rate=0.0, dtype=jnp.bfloat16)
img = jnp.asarray(rng.rand(32, 480, 480, 3), jnp.float32)
vv = vit.init(jax.random.PRNGKey(0), img, deterministic=True)
vf = jax.jit(lambda v, im: jnp.sum(vit.apply(v, im, deterministic=True).astype(jnp.float32)))
print("ViT-B/480 b32:", timeit(vf, vv, img), "ms", flush=True)
