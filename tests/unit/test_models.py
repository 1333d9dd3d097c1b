import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marie_tpu.models.configs import (
    CraftConfig,
    CRNNConfig,
    LayoutLMConfig,
    Pix2PixConfig,
    TrOCRConfig,
)


@pytest.fixture(scope="module")
def trocr():
    from marie_tpu.models.trocr import TrOCRModel

    cfg = TrOCRConfig.tiny()
    model = TrOCRModel(cfg)
    imgs = jnp.zeros((2, 32, 64, 3))
    toks = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    return model, params


def test_trocr_teacher_forced_shape(trocr):
    model, params = trocr
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3)) * 0.1
    toks = jnp.array([[0, 5, 6, 7], [0, 8, 9, 1]], jnp.int32)
    logits = model.apply(params, imgs, toks)
    assert logits.shape == (2, 4, model.cfg.decoder.vocab_size)


def test_rectangular_patches_and_unroll():
    """fast_v2-style full-height patches: token count drops to W/pw and
    greedy decode is bit-identical across while-loop unroll factors."""
    import dataclasses

    from marie_tpu.models.trocr import TrOCRModel, greedy_decode

    base = TrOCRConfig.tiny()
    cfg = TrOCRConfig(
        encoder=dataclasses.replace(
            base.encoder, image_size=(32, 64), patch_size=(32, 8)
        ),
        decoder=base.decoder,
    )
    assert cfg.encoder.seq_len == 8  # 64/8 columns, one row
    model = TrOCRModel(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 64, 3)) * 0.1
    params = model.init(jax.random.PRNGKey(0), imgs, jnp.zeros((3, 4), jnp.int32))
    enc = model.apply(params, imgs, method=TrOCRModel.encode)
    assert enc.shape == (3, 8, cfg.encoder.hidden_dim)
    caps = jnp.asarray([3, 7, 5], jnp.int32)
    ref = greedy_decode(model, params, imgs, 7, step_caps=caps, unroll=1)
    for u in (2, 3):
        out = greedy_decode(model, params, imgs, 7, step_caps=caps, unroll=u)
        assert np.array_equal(np.asarray(ref[0]), np.asarray(out[0]))  # tokens
        assert np.array_equal(np.asarray(ref[1]), np.asarray(out[1]))  # lengths
        # confidences: different unrolled programs fuse the logp
        # accumulation differently — equal to float rounding only
        np.testing.assert_allclose(
            np.asarray(ref[2]), np.asarray(out[2]), rtol=1e-5
        )


def test_greedy_matches_incremental_vs_full(trocr):
    """The cached decode-step path must produce the same logits as the
    full-sequence (flash-attention) path — this validates the KV cache."""
    from marie_tpu.models.trocr import TrOCRModel

    model, params = trocr
    imgs = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64, 3)) * 0.5
    toks = jnp.array([[0, 10, 20, 30]], jnp.int32)

    enc = model.apply(params, imgs, method=TrOCRModel.encode)
    cross = model.apply(params, enc, method=TrOCRModel.prefill)
    full_logits = model.apply(params, toks, cross, method=TrOCRModel.decode_full)

    from marie_tpu.models.trocr import _init_self_caches

    caches = _init_self_caches(model.cfg.decoder, 1)
    step_logits = []
    for pos in range(4):
        lg, caches = model.apply(
            params, toks[:, pos], jnp.asarray(pos), cross, None, caches,
            method=TrOCRModel.decode_step,
        )
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), atol=1e-4
    )


def test_beam_size_one_matches_greedy(trocr):
    from marie_tpu.models.trocr import beam_decode, greedy_decode

    model, params = trocr
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 64, 3)) * 0.5
    gt, gl, _ = greedy_decode(model, params, imgs)
    bt, bl, _ = beam_decode(model, params, imgs, beam_size=1)
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(bt))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(bl))


def test_beam_score_at_least_greedy(trocr):
    """Beam-5's best (length-normalised) score must be >= greedy's."""
    from marie_tpu.models.trocr import beam_decode

    model, params = trocr
    imgs = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 64, 3)) * 0.5
    _, _, c1 = beam_decode(model, params, imgs, beam_size=1)
    _, _, c5 = beam_decode(model, params, imgs, beam_size=5)
    assert np.all(np.asarray(c5) >= np.asarray(c1) - 1e-5)


def test_craft_shapes():
    from marie_tpu.models.craft import CRAFT

    model = CRAFT(CraftConfig.tiny())
    page = jnp.zeros((1, 128, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), page)
    hm = model.apply(variables, page)
    assert hm.shape == (1, 64, 48, 2)
    assert float(jnp.min(hm)) >= 0.0 and float(jnp.max(hm)) <= 1.0


def test_craft_s2d_presets_keep_stride2_grid():
    """Every d2s preset must land on the stride-2 heatmap grid the
    recognizer's crop framing needs, regardless of stem factor."""
    from marie_tpu.models.craft import CRAFT

    for cfg in (CraftConfig.fast_s2d2(), CraftConfig.fast_s4d4()):
        assert cfg.out_stride == 2
        model = CRAFT(
            CraftConfig(
                base_channels=8,
                stem_stride=cfg.stem_stride,
                head_d2s=True,
            )
        )
        page = jnp.zeros((1, 128, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), page)
        hm = model.apply(variables, page)
        assert hm.shape == (1, 64, 64, 2), (cfg.stem_stride, hm.shape)
        assert float(jnp.min(hm)) >= 0.0 and float(jnp.max(hm)) <= 1.0


def test_crnn_shapes():
    from marie_tpu.models.crnn import CRNN

    model = CRNN(CRNNConfig.tiny())
    crops = jnp.zeros((2, 32, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), crops)
    logits = model.apply(variables, crops)
    assert logits.shape == (2, 16, CRNNConfig.tiny().num_classes)


def test_layoutlm_classifier_and_ner():
    from marie_tpu.models.layoutlm import (
        LayoutLMv3ForSequenceClassification,
        LayoutLMv3ForTokenClassification,
    )

    cfg = LayoutLMConfig.tiny(num_labels=3)
    toks = jnp.zeros((2, 16), jnp.int32)
    boxes = jnp.zeros((2, 16, 4), jnp.int32)
    seq_len = jnp.array([10, 16], jnp.int32)
    image = jnp.zeros((2, 32, 32, 3))

    clf = LayoutLMv3ForSequenceClassification(cfg)
    v = clf.init(jax.random.PRNGKey(0), toks, boxes, seq_len, image)
    logits = clf.apply(v, toks, boxes, seq_len, image)
    assert logits.shape == (2, 3)

    ner = LayoutLMv3ForTokenClassification(cfg)
    v = ner.init(jax.random.PRNGKey(1), toks, boxes, seq_len, image)
    logits = ner.apply(v, toks, boxes, seq_len, image)
    assert logits.shape == (2, 16, 3)


def test_layoutlm_padding_invariance():
    """Masked padding must not change valid-token outputs (classifier)."""
    from marie_tpu.models.layoutlm import LayoutLMv3ForSequenceClassification

    cfg = LayoutLMConfig.tiny(num_labels=2)
    rng = np.random.default_rng(0)
    toks_small = jnp.array(rng.integers(1, 100, (1, 8)), jnp.int32)
    boxes_small = jnp.array(rng.integers(0, 500, (1, 8, 4)), jnp.int32)

    clf = LayoutLMv3ForSequenceClassification(cfg)
    v = clf.init(jax.random.PRNGKey(0), toks_small, boxes_small,
                 jnp.array([8]), None)

    toks_pad = jnp.pad(toks_small, ((0, 0), (0, 8)))
    boxes_pad = jnp.pad(boxes_small, ((0, 0), (0, 8), (0, 0)))
    a = clf.apply(v, toks_small, boxes_small, jnp.array([8]), None)
    b = clf.apply(v, toks_pad, boxes_pad, jnp.array([8]), None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sliding_windows_and_merge():
    from marie_tpu.models.layoutlm import merge_window_logits, sliding_windows

    l = 40
    tokens = jnp.arange(l, dtype=jnp.int32)
    boxes = jnp.tile(jnp.arange(l)[:, None], (1, 4)).astype(jnp.int32)
    wt, wb, starts, valid = sliding_windows(tokens, boxes, window=16, stride=8)
    assert wt.shape[1] == 16
    assert int(starts[0]) == 0
    assert int(starts[-1]) == l - 16
    # every position covered at least once
    cover = np.zeros(l, bool)
    for s, v in zip(np.asarray(starts), np.asarray(valid)):
        cover[s : s + v.sum()] = True
    assert cover.all()

    # merging window "logits" that encode position ids reproduces them
    logits = wt[..., None].astype(jnp.float32)
    merged = merge_window_logits(logits, starts, valid, l)
    np.testing.assert_allclose(np.asarray(merged[:, 0]), np.arange(l), atol=1e-5)


def test_pix2pix_generator():
    from marie_tpu.models.pix2pix import ResnetGenerator

    model = ResnetGenerator(Pix2PixConfig.tiny())
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_char_tokenizer_roundtrip():
    from marie_tpu.models.tokenizer import CharTokenizer, CTCCharTokenizer

    tok = CharTokenizer()
    ids = tok.encode("Hello, World! 42", max_len=32)
    assert len(ids) == 32
    assert tok.decode(ids) == "Hello, World! 42"

    ctc = CTCCharTokenizer()
    assert ctc.decode(ctc.encode("abc")) == "abc"
    assert ctc.blank_id == 0


def test_grouped_cross_attention_matches_replicated_full():
    """GQA/MQA math: attention with G shared K/V heads must equal
    full-head attention over the G heads replicated H/G times."""
    from marie_tpu.models.layers import _masked_attention

    rng = jax.random.PRNGKey(7)
    b, h, g, lq, lk, dh = 2, 6, 2, 3, 5, 8
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, lq, dh))
    k = jax.random.normal(kk, (b, g, lk, dh))
    v = jax.random.normal(kv, (b, g, lk, dh))
    mask = (jnp.arange(lk) < 4)[None, None, None, :]

    grouped = _masked_attention(q, k, v, mask)
    k_full = jnp.repeat(k, h // g, axis=1)
    v_full = jnp.repeat(v, h // g, axis=1)
    full = _masked_attention(q, k_full, v_full, mask)
    np.testing.assert_allclose(
        np.asarray(grouped), np.asarray(full), atol=1e-5
    )


def test_mqa_cross_kv_cache_parity_and_decode():
    """fast_v3 shape (cross_kv_heads=1): the prefilled cross-KV carries
    ONE head, step-path logits still match the full path, and greedy
    decode runs end-to-end."""
    import dataclasses

    from marie_tpu.models.trocr import (
        TrOCRModel, _init_self_caches, greedy_decode,
    )

    base = TrOCRConfig.tiny()
    cfg = TrOCRConfig(
        encoder=base.encoder,
        decoder=dataclasses.replace(base.decoder, cross_kv_heads=1),
    )
    model = TrOCRModel(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64, 3)) * 0.5
    toks = jnp.array([[0, 10, 20, 30]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), imgs, toks)

    enc = model.apply(params, imgs, method=TrOCRModel.encode)
    cross = model.apply(params, enc, method=TrOCRModel.prefill)
    # the bandwidth claim: stored cross-KV has exactly one head
    assert cross[0][0].shape[1] == 1

    full_logits = model.apply(params, toks, cross, method=TrOCRModel.decode_full)
    caches = _init_self_caches(cfg.decoder, 1)
    step_logits = []
    for pos in range(4):
        lg, caches = model.apply(
            params, toks[:, pos], jnp.asarray(pos), cross, None, caches,
            method=TrOCRModel.decode_step,
        )
        step_logits.append(lg)
    np.testing.assert_allclose(
        np.asarray(full_logits),
        np.asarray(jnp.stack(step_logits, axis=1)),
        atol=1e-4,
    )

    toks_out, lens, confs = greedy_decode(model, params, imgs, 6)
    assert toks_out.shape[0] == 1 and lens.shape == (1,)
