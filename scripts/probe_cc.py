"""On-chip probes for the round-4 device-efficiency pass (VERDICT r3 #1/#6).

1. CC+stats variants at production shapes — the fused OCR program runs
   CC on the stride-2 heatmap of the 1024x768 page bucket = 512x384
   grid, K=384.  Variants: `component_boxes` (sort + segmented scans),
   `component_boxes_reduce` ([N, K] broadcast reductions — r3 default),
   `component_boxes_reduce2` (row/col projections, intermediates capped
   at [max(H, W), K]).  Timed single and batch-16 (the fused shape),
   plus the label-prop itself.
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


def probe_cc_shape(h, w, k, blobs):
    import jax
    import jax.numpy as jnp

    from marie_tpu.ops.connected_components import (
        component_boxes,
        component_boxes_reduce,
        component_boxes_reduce2,
        component_boxes_runs,
        connected_components,
    )

    rng = np.random.default_rng(0)
    mask = np.zeros((h, w), bool)
    for _ in range(blobs):
        y, x = rng.integers(0, h - 4), rng.integers(0, w - 14)
        mask[y : y + 3, x : x + int(rng.integers(4, 14))] = True
    mask_d = jnp.asarray(mask)
    scores = jnp.asarray(rng.random((h, w)).astype(np.float32))

    from marie_tpu.ops import component_boxes_runs_cc

    labels = connected_components(mask_d)
    t_cc = timed(lambda: connected_components(mask_d))
    t_rcc = timed(lambda: component_boxes_runs_cc(mask_d, scores, k)["boxes"])
    variants = {
        "sort": component_boxes,
        "reduce": component_boxes_reduce,
        "reduce2": component_boxes_reduce2,
        "runs": component_boxes_runs,
    }
    ref = jax.device_get(component_boxes(labels, scores, k))
    out_rcc = jax.device_get(component_boxes_runs_cc(mask_d, scores, k))
    same_rcc = all(
        np.allclose(ref[f], out_rcc[f], atol=1e-5)
        for f in ("boxes", "areas", "scores")
    )
    line = [
        f"CC grid {h}x{w} K={k}: label-prop {t_cc*1e3:.2f} ms | "
        f"runs_cc(all-in-one)={t_rcc*1e3:.2f} ms (match={same_rcc}) |"
    ]
    for name, fn in variants.items():
        t = timed(lambda fn=fn: fn(labels, scores, k)["boxes"])
        out = jax.device_get(fn(labels, scores, k))
        same = all(
            np.allclose(ref[f], out[f], atol=1e-5)
            for f in ("boxes", "areas", "scores")
        ) and np.array_equal(ref["valid"], out["valid"])
        line.append(f"{name}={t*1e3:.2f} ms (match={same})")
    print(" ".join(line), flush=True)

    # batch-of-16 (the fused program shape): label-prop + stats together
    lab16 = jnp.stack([labels] * 16)
    sc16 = jnp.stack([scores] * 16)
    m16 = jnp.stack([mask_d] * 16)
    # jit ONCE outside the timing loop — jax.jit(...) re-created per call
    # re-traces every sample and times HOST tracing, not the device
    cc16 = jax.jit(jax.vmap(connected_components))
    t_cc16 = timed(lambda: cc16(m16))
    rcc16 = jax.jit(
        jax.vmap(lambda m_, s_: component_boxes_runs_cc(m_, s_, k)["boxes"])
    )
    t_rcc16 = timed(lambda: rcc16(m16, sc16))
    parts = [
        f"batch16: label-prop {t_cc16*1e3:.2f} ms ({t_cc16/16*1e3:.2f} ms/pg) | "
        f"runs_cc(all-in-one)={t_rcc16*1e3:.2f} ms ({t_rcc16/16*1e3:.2f} ms/pg) |"
    ]
    for name, fn in variants.items():
        vb = jax.jit(
            lambda l, s, fn=fn: jax.vmap(lambda a_, b_: fn(a_, b_, k))(l, s)[
                "boxes"
            ]
        )
        t = timed(lambda vb=vb: vb(lab16, sc16))
        parts.append(f"{name}={t*1e3:.2f} ms ({t/16*1e3:.2f} ms/pg)")
    print(" ".join(parts), flush=True)


def main() -> int:
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    for h, w, blobs in ((256, 192, 140), (512, 384, 280)):
        probe_cc_shape(h, w, 384, blobs)

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
    sys.exit(main())
