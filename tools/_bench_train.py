import time
import jax, jax.numpy as jnp, numpy as np
from anatomix_tpu.models.unet import UnetConfig, build_plan
from anatomix_tpu.pretraining.train_step import build_train_step, init_train_state
from anatomix_tpu.utils.benchtools import dispatch_floor

plan = build_plan(UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16))
taps = (27, 31, 38, 45, 52, 65)
state = init_train_state(plan, jax.random.PRNGKey(0), tap_layers=taps,
                         num_patches=512, netf_nc=256, lr=2e-4)
rng = np.random.default_rng(0)
views = jax.jit(lambda k: jax.random.normal(k, (1, 2, 128, 128, 128, 1), jnp.float32))(jax.random.PRNGKey(1))
segs = jnp.asarray(rng.integers(0, 10, (1, 128, 128, 128, 1)).astype(np.int32))

for impl in ("xla", "pallas_train"):
    step = build_train_step(plan, tap_layers=taps, num_patches=512,
                            nce_temperature=0.33, lr=2e-4,
                            compute_dtype=jnp.bfloat16, donate=False,
                            conv_impl=impl)
    st = state
    st, m = step(st, views, segs, jax.random.PRNGKey(2))  # compile
    print(impl, "loss:", float(m["loss"]), flush=True)
    floor = dispatch_floor()
    # chain dispatches; each step is one dispatch (big op, floor subtracted)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            st, m = step(st, views, segs, jax.random.PRNGKey(2))
        _ = float(m["loss"])  # sync
        ts.append((time.perf_counter() - t0) / 3)
    ts.sort()
    print(f"{impl}: {max(ts[1]-floor, 0)*1e3:.1f} ms/step", flush=True)
