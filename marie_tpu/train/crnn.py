"""CTC training for the CRNN recognizer (the voting engine's second head).

Same device-resident recipe as the TrOCR trainer: synthetic crops rendered
once per refresh window, uploaded as uint8, `steps_per_dispatch` optimizer
steps per dispatch; loss is optax's CTC over the width-wise frame logits.
"""

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import CRNNConfig, TrOCRConfig, ViTConfig
from marie_tpu.models.crnn import CRNN
from marie_tpu.models.tokenizer import CTCCharTokenizer
from marie_tpu.ops import ctc_greedy_decode
from marie_tpu.train.recognizer import SyntheticWordDataset, character_error_rate


def _crnn_render_config(width: int, height: int) -> TrOCRConfig:
    """Reuse SyntheticWordDataset via a crop-geometry carrier config."""
    from marie_tpu.models.configs import DecoderConfig

    return TrOCRConfig(
        encoder=ViTConfig(image_size=(height, width), use_cls_token=False),
        decoder=DecoderConfig(max_len=32),
    )


def evaluate_crnn_cer(model, variables, dataset, tokenizer, n_samples=64):
    images, _, texts = dataset.sample(n_samples)
    gray = images.mean(axis=-1, keepdims=True)
    logits = jax.jit(lambda v, x: model.apply(v, x))(variables, jnp.asarray(gray))
    tokens, lengths, _ = ctc_greedy_decode(logits, blank_id=0)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    cers = [
        character_error_rate(
            tokenizer.decode(tokens[i, : lengths[i]]), texts[i]
        )
        for i in range(n_samples)
    ]
    return float(np.mean(cers))


def train_crnn_device(
    config: Optional[CRNNConfig] = None,
    steps: int = 8000,
    batch_size: int = 128,
    dataset_size: int = 8192,
    width: int = 256,
    learning_rate: float = 1e-3,
    steps_per_dispatch: int = 50,
    refresh_every: int = 2000,
    noise: float = 0.03,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
):
    logger = MarieLogger("train-crnn")
    config = config or CRNNConfig()
    tokenizer = CTCCharTokenizer()
    assert config.num_classes >= tokenizer.vocab_size
    model = CRNN(config)
    h = config.input_height
    render_cfg = _crnn_render_config(width, h)
    dataset = SyntheticWordDataset(render_cfg, seed=seed, noise=0.0)
    max_label = 24

    def render_block(block_seed):
        ds = SyntheticWordDataset(render_cfg, seed=block_seed, noise=0.0)
        imgs_l, labs_l, lens_l = [], [], []
        for start in range(0, dataset_size, 512):
            n = min(512, dataset_size - start)
            images, _, texts = ds.sample(n)
            gray = (images.mean(axis=-1, keepdims=True) * 255).astype(np.uint8)
            labels = np.zeros((n, max_label), np.int32)
            lengths = np.zeros((n,), np.int32)
            for i, t in enumerate(texts):
                ids = tokenizer.encode(t)[:max_label]
                labels[i, : len(ids)] = ids
                lengths[i] = len(ids)
            imgs_l.append(gray)
            labs_l.append(labels)
            lens_l.append(lengths)
        return (
            jnp.asarray(np.concatenate(imgs_l)),
            jnp.asarray(np.concatenate(labs_l)),
            jnp.asarray(np.concatenate(lens_l)),
        )

    logger.info(f"rendering {dataset_size} CRNN crops...")
    data_imgs, data_labs, data_lens = render_block(seed)

    warmup = max(steps // 10, 1)
    schedule = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup, steps)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-4)
    )

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, h, width, 1), jnp.float32)
    )
    opt_state = jax.jit(optimizer.init)(variables)

    @jax.jit
    def run_block(variables, opt_state, key, imgs_ref, labs_ref, lens_ref):
        def one_step(carry, step_key):
            variables, opt_state = carry
            k_idx, k_noise = jax.random.split(step_key)
            idx = jax.random.randint(k_idx, (batch_size,), 0, dataset_size)
            images = imgs_ref[idx].astype(jnp.float32) / 255.0
            if noise > 0:
                images = jnp.clip(
                    images + noise * jax.random.normal(k_noise, images.shape),
                    0, 1,
                )
            labels = labs_ref[idx]
            lengths = lens_ref[idx]

            def loss_fn(v):
                logits = model.apply(v, images)  # [B, T, V]
                t = logits.shape[1]
                logit_pad = jnp.zeros((batch_size, t), jnp.float32)
                label_pad = (
                    jnp.arange(max_label)[None, :] >= lengths[:, None]
                ).astype(jnp.float32)
                per = optax.ctc_loss(
                    logits, logit_pad, labels, label_pad, blank_id=0
                )
                return per.mean()

            loss, grads = jax.value_and_grad(loss_fn)(variables)
            updates, opt_state = optimizer.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            return (variables, opt_state), loss

        keys = jax.random.split(key, steps_per_dispatch)
        (variables, opt_state), losses = jax.lax.scan(
            one_step, (variables, opt_state), keys
        )
        return variables, opt_state, losses.mean()

    t0 = time.time()
    key = jax.random.PRNGKey(seed + 1)
    done = 0
    next_refresh = refresh_every
    while done < steps:
        if refresh_every and done >= next_refresh:
            data_imgs, data_labs, data_lens = render_block(seed + 1 + done)
            next_refresh += refresh_every
            logger.info(f"dataset refreshed at step {done}")
        key, sub = jax.random.split(key)
        variables, opt_state, mean_loss = run_block(
            variables, opt_state, sub, data_imgs, data_labs, data_lens
        )
        done += steps_per_dispatch
        if done % 500 == 0:
            logger.info(
                f"step {done}/{steps} loss={float(mean_loss):.4f} "
                f"({(time.time() - t0) / done:.3f}s/step)"
            )

    cer = evaluate_crnn_cer(model, variables, dataset, tokenizer)
    logger.info(f"final CER={cer:.4f} after {steps} steps")
    if checkpoint_path:
        from marie_tpu.registry.checkpoints import save_params

        save_params(jax.device_get(variables), checkpoint_path)
        logger.info(f"saved checkpoint to {checkpoint_path}")
    return model, variables, cer
