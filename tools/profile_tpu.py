"""Break down per-frame time on the real device: encode / segment / memorize /
host transfers, at 480p with 3 objects."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def timeit(name, fn, n=20):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1000:8.2f} ms")
    return dt


def main():
    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference.state import init_state
    from cutie_tpu.inference.steps import StepFunctions
    from cutie_tpu.utils.get_default_model import build_model

    cfg = eval_config("base")
    cfg.dataset = "d17-val"
    get_dataset_cfg(cfg)
    bundle = build_model(cfg, weights=None)
    steps = StepFunctions(bundle.model, cfg)

    h0, w0 = 480, 864  # padded 480x854
    o = 4
    img = jnp.asarray(np.random.rand(1, h0, w0, 3), jnp.float32)
    state = init_state(batch=1, max_objects=o, h=h0 // 16, w=w0 // 16,
                       sensory_dim=256, key_dim=64, value_dim=256,
                       num_queries=16, embed_dim=256, perm_frames=1,
                       work_frames=4, lt_capacity=8)
    sel = jnp.asarray(np.array([1, 1, 1, 0], np.float32))

    print(f"devices: {jax.devices()}")
    feats = steps.encode(bundle.variables, img)
    jax.block_until_ready(feats)

    # fill memory: one permanent frame
    state = steps.memorize(bundle.variables, state, img, feats, sel,
                           jnp.asarray(True), as_permanent=True)
    jax.block_until_ready(state)

    timeit("encode", lambda: steps.encode(bundle.variables, img))

    def seg():
        nonlocal state
        state, prob = steps.segment(bundle.variables, state, feats, sel,
                                    jnp.asarray(True))
        return prob

    timeit("segment(read+decode)", seg)

    def mem():
        nonlocal state
        state = steps.memorize(bundle.variables, state, img, feats, sel,
                               jnp.asarray(True), as_permanent=False)
        return state.work_count

    timeit("memorize", mem)

    # host transfer costs
    prob = seg()
    timeit("prob->host (6.4MB)", lambda: np.asarray(prob))
    host_img = np.random.rand(1, h0, w0, 3).astype(np.float32)
    timeit("img->device (5MB)", lambda: jax.device_put(host_img))

    # a dummy tiny op to measure dispatch latency
    one = jnp.ones((8, 128))
    f = jax.jit(lambda x: x + 1)
    f(one)
    timeit("tiny jit dispatch", lambda: f(one), n=50)


if __name__ == "__main__":
    main()
