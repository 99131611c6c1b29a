"""Compile+run the fused truncated-EDT rebuild on the TPU; compare to the pass chain."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from neoplanner_tpu.config import MapParams
from neoplanner_tpu.mapping import occupancy
from neoplanner_tpu.ops import edt, edt_pallas

mp = MapParams()
thr = float(occupancy._l(mp.occ_threshold) + 1e-6)
E = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rng = np.random.default_rng(0)
lo = jnp.asarray((rng.uniform(0, 1, size=(E, 192, 256)) < 0.01)
                 .astype(np.float32) * 3.0 - 1.0)

fused = jax.jit(jax.vmap(lambda x: edt_pallas.rebuild_truncated_lite(
    x, thr, mp.resolution, 2.0)))
chain = jax.jit(jax.vmap(lambda x: edt.edt_truncated(
    occupancy.to_occupancy(x, mp), mp.resolution, 2.0).astype(jnp.bfloat16)))

t0 = time.time(); got = fused(lo); s = float(np.asarray(jnp.sum(got.astype(jnp.float32))))
print("fused compiled+ran %.1fs" % (time.time() - t0), flush=True)
t0 = time.time(); want = chain(lo); s2 = float(np.asarray(jnp.sum(want.astype(jnp.float32))))
print("chain compiled+ran %.1fs" % (time.time() - t0), flush=True)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
print("max abs err:", err, flush=True)
for name, f in (("fused", fused), ("chain", chain)):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = f(lo); _ = float(np.asarray(jnp.sum(o.astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    print("%s steady: %.1f ms for E=%d" % (name, np.median(ts) * 1e3, E), flush=True)
