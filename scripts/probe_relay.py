#!/usr/bin/env python
"""Relay-floor probe: measures the axon host->TPU link in isolation.

Answers, with numbers, the questions the round-3 perf plan hangs on:
  1. upload bandwidth (device_put, synced via a scalar reduce — NOT a
     full round trip, which double-counts download)
  2. download bandwidth + small-transfer RTT latency
  3. whether a background-thread device_put OVERLAPS with the fused OCR
     program executing (the double-buffering premise)
  4. persistent-compile-cache behaviour (hit/miss wall time)

Run:  python scripts/probe_relay.py            (needs the TPU; ~3 min warm)
"""

import json
import logging
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync_scalar(jax, x):
    """Block until x's producing computation is done, paying only a
    scalar transfer (device_get(x) would download the whole buffer)."""
    jax.device_get(jax.numpy.ravel(x)[0])


def main():
    logging.basicConfig(level=logging.WARNING)
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

    t_imp = time.time()
    from marie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"import+init {time.time()-t_imp:.1f}s platform={dev.platform}",
          flush=True)

    out = {}

    # --- 1. upload bandwidth at serving-relevant sizes --------------------
    for mb in (1, 12, 50):
        arr = np.random.randint(0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
        # warm the sum program for this shape
        x = jax.device_put(arr)
        s = jnp.sum(x[:8])
        _sync_scalar(jax, s)
        times = []
        for _ in range(3):
            t0 = time.time()
            x = jax.device_put(arr)
            _sync_scalar(jax, jnp.sum(x[:8]))
            times.append(time.time() - t0)
        best = min(times)
        out[f"upload_{mb}MB_s"] = round(best, 4)
        out[f"upload_{mb}MB_MBps"] = round(mb / best, 1)
        print(f"upload {mb}MB: {times} -> {mb/best:.1f} MB/s", flush=True)

    # --- 2. download bandwidth + RTT latency ------------------------------
    arr12 = np.random.randint(0, 255, (12 * 1024 * 1024,), dtype=np.uint8)
    x12 = jax.device_put(arr12)
    _sync_scalar(jax, jnp.sum(x12[:8]))
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.device_get(x12)
        times.append(time.time() - t0)
    out["download_12MB_MBps"] = round(12 / min(times), 1)
    print(f"download 12MB: {times} -> {12/min(times):.1f} MB/s", flush=True)

    small = jax.device_put(np.zeros((8,), np.float32))
    times = []
    for _ in range(10):
        t0 = time.time()
        jax.device_get(small)
        times.append(time.time() - t0)
    times.sort()
    out["rtt_small_ms_p50"] = round(times[len(times) // 2] * 1000, 2)
    out["rtt_small_ms_min"] = round(times[0] * 1000, 2)
    print(f"small device_get RTT p50={out['rtt_small_ms_p50']}ms "
          f"min={out['rtt_small_ms_min']}ms", flush=True)

    # --- 3. overlap: background device_put during fused OCR execution -----
    # Build the EXACT bench program (cache hit expected).
    import bench as bench_mod

    from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
    from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
    from marie_tpu.models.configs import CraftConfig, TrOCRConfig
    from marie_tpu.ocr.fused import (
        _fused_pages_compact,
        _is_grayscale,
        _pallas_crop_default,
    )
    from marie_tpu.preprocess import BucketSpec
    from marie_tpu.registry.checkpoints import load_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    box = BoxProcessorCraft(
        config=CraftConfig.fast(),
        variables=load_params(os.path.join(repo, "model_zoo", "craft-fast-synth")),
        box_source="heatmap", text_threshold=0.6, low_text=0.4,
        max_components=384,
        bucket_spec=BucketSpec(shapes=((1024, 768),)),
        param_dtype="bfloat16",
    )
    icr = TrOcrProcessor(
        config=TrOCRConfig.fast(),
        params=load_params(os.path.join(repo, "model_zoo", "trocr-fast-synth")),
        beam_size=1, param_dtype="bfloat16", batch_sizes=(32, 128, 256),
    )
    pages = bench_mod.make_pages(16, seed=3)
    preps = [box.prep_page(p) for p in pages]
    batch_np = np.stack([p[0] for p in preps])
    if _is_grayscale(batch_np):
        batch_np = batch_np[..., 0]
    clip = jnp.asarray(
        [[p[2][1] * p[1], p[2][0] * p[1]] for p in preps], jnp.float32
    )

    def run_fused(batch_dev):
        t0 = time.time()
        stats, tokens, conf = _fused_pages_compact(
            box.model, box.variables, icr.model, icr.params, batch_dev, clip,
            jnp.int32(16),
            box.text_threshold, box.low_text, box.link_threshold,
            float(box.min_area), float(box.box_expand), box.max_components,
            box.box_source, 16 * 192, icr.crop_h, icr.crop_w,
            icr.compute_dtype, icr.decode_steps, _pallas_crop_default(),
        )
        _sync_scalar(jax, conf)
        return time.time() - t0, (stats, tokens, conf)

    t0 = time.time()
    batch_dev = jax.device_put(batch_np)
    dt_compile, _ = run_fused(batch_dev)
    out["fused_first_call_s"] = round(dt_compile, 1)
    print(f"fused first call (cache {'hit' if dt_compile < 30 else 'MISS?'}) "
          f"{dt_compile:.1f}s", flush=True)

    # serial baseline: run fused, THEN upload the next batch
    dt_f, _ = run_fused(batch_dev)
    dt_f2, _ = run_fused(batch_dev)
    dt_fused = min(dt_f, dt_f2)
    batch2_np = batch_np.copy()
    t0 = time.time()
    b2 = jax.device_put(batch2_np)
    _sync_scalar(jax, jnp.sum(b2.ravel()[:8]))
    dt_up = time.time() - t0
    out["fused_exec_s"] = round(dt_fused, 3)
    out["upload_16p_gray_s"] = round(dt_up, 3)
    mb16 = batch_np.nbytes / 1e6
    print(f"fused exec {dt_fused*1000:.0f}ms; 16p upload ({mb16:.1f}MB) "
          f"{dt_up*1000:.0f}ms serial", flush=True)

    # overlapped: background thread uploads while fused runs
    results = {}

    def bg_upload():
        t0 = time.time()
        b = jax.device_put(batch2_np)
        _sync_scalar(jax, jnp.sum(b.ravel()[:8]))
        results["bg_upload_s"] = time.time() - t0

    best_overlap = float("inf")
    for _ in range(2):
        th = threading.Thread(target=bg_upload)
        t0 = time.time()
        th.start()
        dt_f, _ = run_fused(batch_dev)
        th.join()
        total = time.time() - t0
        best_overlap = min(best_overlap, total)
    serial_sum = dt_fused + dt_up
    out["overlap_total_s"] = round(best_overlap, 3)
    out["overlap_serial_sum_s"] = round(serial_sum, 3)
    out["overlap_ratio"] = round(best_overlap / serial_sum, 3)
    print(f"overlap: total {best_overlap*1000:.0f}ms vs serial sum "
          f"{serial_sum*1000:.0f}ms -> ratio {out['overlap_ratio']}"
          " (0.5-0.7 = overlapping, ~1.0 = serialized)", flush=True)

    # --- 4. 4-bit pack: host pack cost + device unpack correctness --------
    t0 = time.time()
    q = (batch_np >> 4).astype(np.uint8)
    packed = (q[..., 0::2] << 4) | q[..., 1::2]  # [P, H, W//2]
    t_pack = time.time() - t0
    out["pack4_host_ms_per_16p"] = round(t_pack * 1000, 1)

    @jax.jit
    def unpack4(pk):
        hi = (pk >> 4).astype(jnp.uint8)
        lo = (pk & 0xF).astype(jnp.uint8)
        inter = jnp.stack([hi, lo], axis=-1).reshape(*pk.shape[:-1], -1)
        return inter * jnp.uint8(17)

    pk_dev = jax.device_put(packed)
    up = unpack4(pk_dev)
    _sync_scalar(jax, up)
    t0 = time.time()
    pk_dev = jax.device_put(packed)
    up = unpack4(pk_dev)
    _sync_scalar(jax, up)
    out["upload_packed_16p_s"] = round(time.time() - t0, 3)
    host_ref = (q.repeat(2, axis=-1))  # not the same — just check shape
    up_h = np.asarray(jax.device_get(up))
    exact = np.array_equal(up_h[..., 0::2], (batch_np >> 4) // 1 * 17) if False else None
    err = np.abs(up_h.astype(np.int16) - batch_np.astype(np.int16)).max()
    out["pack4_max_abs_err"] = int(err)
    print(f"pack4: host {t_pack*1000:.0f}ms/16p, upload+unpack "
          f"{out['upload_packed_16p_s']}s, max_abs_err {err} (<=15 expected)",
          flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
