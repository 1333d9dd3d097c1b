"""On-chip probes for the round-4 device-efficiency pass (VERDICT r3 #1/#6).

1. CC+stats variants at production shapes (stride-2 heatmap of the
   512x384 bucket = 256x192 grid, K=384): `component_boxes` (sort+
   segmented-scan) vs `component_boxes_reduce` ([N,K] broadcast
   reductions) — r3 shipped `reduce` everywhere; the [N,K]=49k x 384
   materialisation is suspected to be the 3.05 ms/page CC cost.
2. AOT program-zoo deserialize+load vs persistent-cache compile+load
   for a mid-size program (the cold-start lever).

    python scripts/probe_cc.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timed(fn, n=3):
    import jax

    fn()  # compile/warm
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        jax.device_get(fn())
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from marie_tpu.ops.connected_components import (
        component_boxes,
        component_boxes_reduce,
        connected_components,
    )

    h, w, k = 256, 192, 384
    rng = np.random.default_rng(0)
    # text-like mask: ~140 word blobs
    mask = np.zeros((h, w), bool)
    for _ in range(140):
        y, x = rng.integers(0, h - 4), rng.integers(0, w - 14)
        mask[y : y + 3, x : x + int(rng.integers(4, 14))] = True
    mask_d = jnp.asarray(mask)
    scores = jnp.asarray(rng.random((h, w)).astype(np.float32))

    labels = connected_components(mask_d)
    t_cc = timed(lambda: connected_components(mask_d))
    t_sort = timed(lambda: component_boxes(labels, scores, k)["boxes"])
    t_reduce = timed(
        lambda: component_boxes_reduce(labels, scores, k)["boxes"]
    )
    a = jax.device_get(component_boxes(labels, scores, k))
    b = jax.device_get(component_boxes_reduce(labels, scores, k))
    same = all(
        np.allclose(a[f], b[f], atol=1e-5)
        for f in ("boxes", "areas", "scores")
    ) and np.array_equal(a["valid"], b["valid"])
    print(
        f"CC grid {h}x{w} K={k}: label-prop {t_cc*1e3:.2f} ms | "
        f"stats sort={t_sort*1e3:.2f} ms reduce={t_reduce*1e3:.2f} ms | "
        f"outputs identical: {same}"
    )

    # batch-of-16 version (the fused program shape)
    lab16 = jnp.stack([labels] * 16)
    sc16 = jnp.stack([scores] * 16)
    vb_sort = jax.jit(
        lambda l, s: jax.vmap(lambda a_, b_: component_boxes(a_, b_, k))(l, s)[
            "boxes"
        ]
    )
    vb_red = jax.jit(
        lambda l, s: jax.vmap(
            lambda a_, b_: component_boxes_reduce(a_, b_, k)
        )(l, s)["boxes"]
    )
    t16_sort = timed(lambda: vb_sort(lab16, sc16))
    t16_red = timed(lambda: vb_red(lab16, sc16))
    print(
        f"batch16 stats: sort={t16_sort*1e3:.2f} ms ({t16_sort/16*1e3:.2f}"
        f" ms/page) reduce={t16_red*1e3:.2f} ms ({t16_red/16*1e3:.2f} ms/page)"
    )

    # --- AOT deserialize vs cached compile ------------------------------
    from marie_tpu.utils import program_zoo as pz

    def big(x, y):
        for _ in range(8):
            x = jnp.tanh(x @ y)
        return x

    jitted = jax.jit(big)
    a_in = jnp.ones((1024, 1024), jnp.bfloat16)
    t0 = time.time()
    compiled = jitted.lower(a_in, a_in).compile()
    t_compile = time.time() - t0
    key = pz.key_for("probe-big", (a_in, a_in))
    pz.save_compiled(key, compiled)
    t0 = time.time()
    loaded = pz.load_compiled(key)
    t_load = time.time() - t0
    ok = loaded is not None and np.allclose(
        np.asarray(loaded(a_in, a_in), np.float32),
        np.asarray(compiled(a_in, a_in), np.float32),
        atol=1e-2,
    )
    print(
        f"AOT probe: cache-compile+load {t_compile:.2f} s vs zoo "
        f"deserialize+load {t_load:.2f} s (exec match: {ok})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
