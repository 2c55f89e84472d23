import time
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
for mb in (1, 16, 64, 256):
    a = np.random.default_rng(0).integers(0, 1000, (mb * 1024 * 1024) // 4).astype(np.int32)
    t0 = time.time()
    d = jax.device_put(a)
    d.block_until_ready()
    t1 = time.time()
    # force a real sync with a tiny D2H
    _ = jax.device_get(jnp.ravel(d)[:1])
    t2 = time.time()
    print(f"H2D {mb:4d}MB: put={t1-t0:6.2f}s sync={t2-t1:6.2f}s -> {mb/max(t2-t0,1e-9):7.1f} MB/s", flush=True)
# D2H
d = jax.device_put(np.zeros((64*1024*1024)//4, np.int32)); d.block_until_ready()
t0 = time.time(); h = jax.device_get(d); t1 = time.time()
print(f"D2H   64MB: {t1-t0:6.2f}s -> {64/max(t1-t0,1e-9):7.1f} MB/s", flush=True)
