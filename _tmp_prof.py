import time, jax, jax.numpy as jnp
from deep_kernel_transfer_tpu.methods import DKT
from deep_kernel_transfer_tpu.models.backbones import Conv4
from deep_kernel_transfer_tpu.utils.profiling import sync

model = DKT(Conv4(), n_way=5, n_support=5, kernel_type="bncossim")
x1 = jnp.zeros((5, 20, 84, 84, 3), jnp.float32)
state = model.init(jax.random.PRNGKey(0), x1)
B = 16
xb = jax.random.uniform(jax.random.PRNGKey(1), (B,) + x1.shape)

def timeit(f, *a, iters=10):
    o = f(*a); sync(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    sync(o)
    return (time.perf_counter()-t0)/iters*1e3

# trunk-only fwd+bwd in bf16 (the model's feature_dtype default)
feat = model.feature  # flax module
fparams = state.params["feature"]
flat = xb.reshape(B*100, 84, 84, 3)

def trunk_loss(p, x):
    z = model.apply_feature(p, x) if hasattr(model, "apply_feature") else None
    return jnp.sum(z.astype(jnp.float32)**2)
try:
    g = jax.jit(jax.grad(trunk_loss))
    t = timeit(g, fparams, flat)
    print(f"trunk fwd+bwd: {t:.1f} ms")
except Exception as e:
    print("trunk probe failed:", str(e)[:200])

t_full = timeit(lambda xb: model.train_step(state, xb)[1]["loss"], xb)
print(f"full step: {t_full:.1f} ms")
