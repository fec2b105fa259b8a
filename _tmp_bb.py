import time, jax, jax.numpy as jnp
from deep_kernel_transfer_tpu.methods import DKT
from deep_kernel_transfer_tpu.models.backbones import Conv4
from deep_kernel_transfer_tpu.utils.profiling import sync

model = DKT(Conv4(), n_way=5, n_support=5, kernel_type="bncossim")
x1 = jnp.zeros((5, 20, 84, 84, 3), jnp.float32)
state = model.init(jax.random.PRNGKey(0), x1)
for B in (16, 32, 64):
    xb = jax.random.uniform(jax.random.PRNGKey(1), (B,) + x1.shape)
    st = state
    st, m = model.train_step(st, xb)
    sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        st, m = model.train_step(st, xb)
    sync(m["loss"])
    dt = (time.perf_counter()-t0)/10
    print(f"B={B}: {B/dt:.1f} eps/s ({dt*1e3:.1f} ms/step)")
