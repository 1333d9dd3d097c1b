"""On-chip detector forward A/B: time CRAFT fwd + detect (fwd+CC+stats)
for each trained detector checkpoint on one 16-page group.

    python scripts/probe_detector_speed.py [slots...]

Defaults to every craft-* dir in model_zoo (stage dirs included when
named on the command line).  Prints ms/page for fwd-only and the full
detection program — the device-side numbers behind bench.py's
craft_fwd/cc_boxstats stage rows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "craft-synth": "base",
    "craft-fast-synth": "fast",
    "craft-s2-synth": "fast_s2",
    "craft-s2d2-synth": "fast_s2d2",
    "craft-s2d2-dense-stage": "fast_s2d2",
    "craft-s4d4-synth": "fast_s4d4",
    "craft-s4d4-stage": "fast_s4d4",
}


def main() -> int:
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from marie_tpu.boxes.craft_box_processor import (
        BoxProcessorCraft,
        _detect_batch_jit,
    )
    from marie_tpu.models.configs import CraftConfig
    from marie_tpu.preprocess import BucketSpec
    from marie_tpu.preprocess.ops import normalize_page
    from marie_tpu.registry.checkpoints import load_params
    from bench import make_pages

    slots = sys.argv[1:] or [
        d for d in sorted(os.listdir(os.path.join(REPO, "model_zoo")))
        if d in CONFIGS
    ]
    pages = make_pages(16, seed=7)

    for slot in slots:
        path = os.path.join(REPO, "model_zoo", slot)
        if not os.path.isdir(path) or slot not in CONFIGS:
            print(f"{slot}: skipped (missing or unknown config)")
            continue
        cfg = getattr(CraftConfig, CONFIGS[slot])()
        box = BoxProcessorCraft(
            config=cfg, variables=load_params(path), box_source="heatmap",
            text_threshold=0.6, low_text=0.4, max_components=384,
            bucket_spec=BucketSpec(shapes=((1024, 768),)),
            param_dtype="bfloat16",
        )
        preps = [box.prep_page(p) for p in pages]
        batch = jnp.asarray(np.stack([p[0] for p in preps]))
        batch_rgb = (
            jnp.repeat(batch[..., None], 3, axis=-1)
            if batch.ndim == 3 else batch
        )
        vdt = jax.tree_util.tree_leaves(box.variables)[0].dtype

        @jax.jit
        def fwd_only(pages_u8, box=box, vdt=vdt):
            rgb = jax.vmap(normalize_page)(pages_u8).astype(vdt)
            return box.model.apply(box.variables, rgb).sum()

        def timed(fn, n=3):
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                jax.device_get(fn())
                best = min(best, time.time() - t0)
            return best

        fwd_only(batch_rgb)  # compile
        t_fwd = timed(lambda: fwd_only(batch_rgb))
        args = (
            box.model, box.variables, batch_rgb, box.text_threshold,
            box.low_text, box.link_threshold, box.max_components,
            box.box_source,
        )
        _detect_batch_jit(*args)["scores"].block_until_ready()
        t_det = timed(lambda: _detect_batch_jit(*args)["scores"].sum())
        print(
            f"{slot} ({CONFIGS[slot]}): fwd {t_fwd / 16 * 1000:.2f} ms/page, "
            f"detect {t_det / 16 * 1000:.2f} ms/page",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
