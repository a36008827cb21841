import time, numpy as np, jax, jax.numpy as jnp
from bridgeqa_tpu.models.med import BertLMHeadModel, MedConfig
rng = np.random.RandomState(0)
def timeit(fn, *args, n=3):
    out = fn(*args); jax.device_get(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.device_get(fn(*args)); ts.append(time.perf_counter()-t0)
    return round(min(ts)*1e3, 1)

B, LA, KB, LQ = 8192, 12, 32, 80
cfg = MedConfig()
m = BertLMHeadModel(cfg, dtype=jnp.bfloat16)
ids = jnp.asarray(rng.randint(1, 30000, (B, LA)))
atts = jnp.ones((B, LA), jnp.int32)
qs = jnp.asarray(rng.rand(KB, LQ, 768), jnp.bfloat16)
qm = jnp.ones((KB, LQ), jnp.int32)
labels = jnp.where(jnp.asarray(rng.rand(B, LA)) < 0.1, -100, ids)
v = m.init(jax.random.PRNGKey(0), ids[:64], atts[:64], qs, qm, deterministic=True)
for cs in (512, 2048, 4096):
    f = jax.jit(lambda v, i, a, q, qm_, l, cs=cs: jnp.sum(
        m.apply(v, i, a, q, qm_, labels=l, deterministic=True, loss_chunk_size=cs)[1]))
    print(f"scoring body+head chunk{cs}:", timeit(f, v, ids, atts, qs, qm, labels), "ms", flush=True)

# KV-cache generate speedup at reference settings (b32, beams 5, len 20)
from bridgeqa_tpu.models.generation import beam_search, beam_search_cached
Bq, NB, ML = 32, 5, 20
K = 2 * NB
qs_rows = jnp.asarray(rng.rand(Bq * K, LQ, 768), jnp.bfloat16)
qm_rows = jnp.ones((Bq * K, LQ), jnp.int32)

def uncached(v):
    def decode_fn(flat_ids, flat_mask):
        logits, _ = m.apply(v, flat_ids, flat_mask, qs_rows, qm_rows, deterministic=True)
        return logits
    ids, sc = beam_search(decode_fn, Bq, K, bos_token_id=30522, eos_token_id=102,
                          pad_token_id=0, max_length=ML, min_length=1)
    return sc

def cached(v):
    cache = m.apply(v, qs_rows, qm_rows, ML, method="init_cache")
    def step_fn(tok, c):
        return m.apply(v, tok, c, method="decode_step")
    ids, sc = beam_search_cached(step_fn, cache, Bq, K, bos_token_id=30522,
                                 eos_token_id=102, pad_token_id=0, max_length=ML, min_length=1)
    return sc
print("generate uncached (b32, 10 beams, len20):", timeit(jax.jit(uncached), v), "ms", flush=True)
print("generate KV-cached:", timeit(jax.jit(cached), v), "ms", flush=True)

# detector breakdown
from bridgeqa_tpu.ops.sampling import furthest_point_sample
pc = jnp.asarray((rng.rand(32, 40000, 3) - 0.5) * 6.0, jnp.float32)
fps = jax.jit(lambda p: jnp.sum(furthest_point_sample(p, 2048)))
print("FPS 40k->2048 b32:", timeit(fps, pc), "ms", flush=True)
from bridgeqa_tpu.ops.grouping import query_and_group
qg = jax.jit(lambda p: jnp.sum(query_and_group(0.2, 64, p, p[:, :2048])[..., 0]))
print("ball query+group 40k/2048x64 b32:", timeit(qg, pc), "ms", flush=True)
