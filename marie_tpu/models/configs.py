"""Model size configs.

Presets mirror the reference's deployed models (TrOCR-base/-small on
384×384 crops — ``/root/reference/marie/document/trocr_ocr_processor.py``;
CRAFT VGG16-BN; LayoutLMv3-base) plus TPU-first "fast" presets with
rectangular crops sized for serving throughput, and tiny presets for
CPU tests.
"""

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: Tuple[int, int] = (384, 384)  # (H, W)
    # int = square patches; (ph, pw) tuple = rectangular (e.g. full-height
    # word-crop patches: each token covers a vertical glyph slice, which
    # cuts token count — and with it encoder FLOPs and the decoder's
    # per-step cross-attention K/V traffic — without touching pixels seen)
    patch_size: int | Tuple[int, int] = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    channels: int = 3
    use_cls_token: bool = True
    dropout: float = 0.0
    # dense-head output stride (DiT detector): the patch grid (stride 16)
    # is conv-upsampled to this stride.  2 keeps inter-word gaps >=1 cell
    # when a full 1024x768 page is served downscaled into the 512x384
    # bucket (stride-4 head at half-res = stride 8 in page pixels — word
    # gaps quantized to <1 cell and every line merged into one component)
    head_stride: int = 4
    # sub-pixel phase factor (DiT detector): the conv stack upsamples to
    # head_stride*subpixel and the final 1x1 head predicts subpixel^2
    # phase maps per channel, depth-to-spaced to head_stride — the same
    # trick that fixed the TextFuseNet stride-4 head (models/
    # textfusenet.py) and at subpixel=2/head_stride=1 it halves the
    # effective page-pixel stride of a downscale-served page without a
    # full-resolution conv stage
    subpixel: int = 1

    @property
    def patch_hw(self) -> Tuple[int, int]:
        p = self.patch_size
        return (p, p) if isinstance(p, int) else p

    @property
    def seq_len(self) -> int:
        h, w = self.image_size
        ph, pw = self.patch_hw
        n = (h // ph) * (w // pw)
        return n + (1 if self.use_cls_token else 0)

    @staticmethod
    def dit_synth() -> "ViTConfig":
        """The in-repo synthetic-trained DiT detector backbone
        (train/dit.py -> model_zoo/dit-synth)."""
        return ViTConfig(
            image_size=(512, 384), patch_size=16, hidden_dim=256,
            num_layers=6, num_heads=4, mlp_dim=1024, use_cls_token=False,
            head_stride=2,
        )

    @staticmethod
    def dit_synth_s1() -> "ViTConfig":
        """dit_synth with a 2x2 sub-pixel phase head: output grid at
        stride 1 off the stride-2 conv stack.  A 1024x768 page served
        downscaled into the 512x384 bucket sees an effective page-pixel
        stride of 2 instead of 4 — the stride-4 cell size is what capped
        the classic head's oracle IoU at 0.685 (the same quantization
        that collapsed CraftConfig.fast_s2 to IoU 0.71 and the stride-4
        TextFuseNet head to recall 0.723)."""
        base = ViTConfig.dit_synth()
        return dataclasses.replace(base, head_stride=1, subpixel=2)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 512
    hidden_dim: int = 768
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 3072
    max_len: int = 48
    dropout: float = 0.0
    bos_id: int = 0
    eos_id: int = 1
    pad_id: int = 2
    # grouped/multi-query CROSS-attention K/V heads (None = num_heads).
    # Every decode step re-reads the whole prefilled cross-KV from HBM,
    # so G=1 cuts that traffic num_heads× (decode's bandwidth floor)
    cross_kv_heads: int | None = None


@dataclasses.dataclass(frozen=True)
class TrOCRConfig:
    encoder: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)

    @staticmethod
    def base() -> "TrOCRConfig":
        """Parity-shaped preset (TrOCR-base: DeiT-base encoder, 384²)."""
        return TrOCRConfig(
            encoder=ViTConfig(),
            decoder=DecoderConfig(
                vocab_size=512, hidden_dim=768, num_layers=6, num_heads=12
            ),
        )

    @staticmethod
    def fast() -> "TrOCRConfig":
        """TPU-first serving preset: rectangular word crops (48×320),
        compact decoder — sized for ≥50 pages/s/chip."""
        return TrOCRConfig(
            encoder=ViTConfig(
                image_size=(48, 320),
                patch_size=16,
                hidden_dim=384,
                num_layers=6,
                num_heads=6,
                mlp_dim=1536,
                use_cls_token=False,
            ),
            decoder=DecoderConfig(
                vocab_size=512,
                hidden_dim=384,
                num_layers=4,
                num_heads=6,
                mlp_dim=1536,
                max_len=32,
            ),
        )

    @staticmethod
    def fast_v2() -> "TrOCRConfig":
        """fast with FULL-HEIGHT patches (48×16): 20 tokens per crop
        instead of 60.  Each token is a vertical glyph slice (~2/3 of a
        glyph at the h//2 nominal glyph width) — the CRNN-style column
        factorization.  3× fewer tokens cuts encoder token-FLOPs ~3× AND
        the decoder's per-step cross-attention K/V reads ~3× — the two
        dominant terms of the fused program's crop+decode stage (on-chip
        probe r3: enc+prefill 5.2 ms/page of 9.2 total at 60 tokens)."""
        base = TrOCRConfig.fast()
        return TrOCRConfig(
            encoder=dataclasses.replace(base.encoder, patch_size=(48, 16)),
            decoder=base.decoder,
        )

    @staticmethod
    def fast_v3() -> "TrOCRConfig":
        """fast_v2 + multi-query cross-attention (1 shared K/V head):
        the prefilled cross-KV shrinks 6× (num_heads), cutting the
        decode loop's dominant HBM traffic (round-3 probe: ~944 MB/step
        at 60 enc tokens; fast_v2 took it to ~315, MQA to ~52)."""
        base = TrOCRConfig.fast_v2()
        return TrOCRConfig(
            encoder=base.encoder,
            decoder=dataclasses.replace(base.decoder, cross_kv_heads=1),
        )

    @staticmethod
    def fast_v3_g2() -> "TrOCRConfig":
        """fast_v2 + grouped-query cross-attention (2 shared K/V heads):
        the middle ground after the pure-MQA ``fast_v3`` was
        gate-REJECTED (held-out serif-bold CER 0 -> 0.0148 — one shared
        K/V head cannot carry cross-font glyph detail).  3× smaller
        prefilled cross-KV instead of 6×."""
        base = TrOCRConfig.fast_v2()
        return TrOCRConfig(
            encoder=base.encoder,
            decoder=dataclasses.replace(base.decoder, cross_kv_heads=2),
        )

    @staticmethod
    def fast_v3_g2_d6() -> "TrOCRConfig":
        """fast_v3_g2 with a 6-layer decoder (4 -> 6): open-vocabulary
        char-level reading needs more decoder capacity than lexicon
        recall (r4 gate runs plateaued at serif/mono CER ~0.006-0.010);
        the GQA-2 cross-KV saving (3x less per-step HBM) pays for the
        extra layers' compute, so decode cost stays at or below the
        serving fast_v2's."""
        base = TrOCRConfig.fast_v3_g2()
        return TrOCRConfig(
            encoder=base.encoder,
            decoder=dataclasses.replace(base.decoder, num_layers=6),
        )

    @staticmethod
    def tiny() -> "TrOCRConfig":
        """CPU-test preset."""
        return TrOCRConfig(
            encoder=ViTConfig(
                image_size=(32, 64),
                patch_size=16,
                hidden_dim=64,
                num_layers=2,
                num_heads=2,
                mlp_dim=128,
                use_cls_token=False,
            ),
            decoder=DecoderConfig(
                vocab_size=104,
                hidden_dim=64,
                num_layers=2,
                num_heads=2,
                mlp_dim=128,
                max_len=12,
            ),
        )


@dataclasses.dataclass(frozen=True)
class CraftConfig:
    """CRAFT detector (VGG16-BN U-Net, reference marie/models/craft/craft.py:31)."""

    base_channels: int = 32
    num_classes: int = 2  # region + affinity heatmaps
    # 2 = space-to-depth input stem: stage1 runs at half resolution
    # (the full-res stage is the MXU-underfilling, memory-bound part of
    # the forward) and the heatmap comes out at stride 4 instead of 2
    stem_stride: int = 1
    # sub-pixel head: predict 2x2 phase heatmaps and depth-to-space them
    # one level finer.  With stem_stride=2 this restores the stride-2
    # output grid the recognizer's crop framing needs (the bare s2d stem
    # measured recall 0.99 but stride-4 box quantization collapsed IoU to
    # 0.71 / page CER to 25% — the head, not the trunk, was the problem)
    head_d2s: bool = False

    @property
    def out_stride(self) -> int:
        """Heatmap-grid to page-pixel factor.

        The sub-pixel head's depth-to-space factor equals
        ``stem_stride``, so any d2s config lands back on the stride-2
        grid the recognizer's crop framing needs."""
        return 2 if self.head_d2s else 2 * self.stem_stride

    @staticmethod
    def base() -> "CraftConfig":
        return CraftConfig(base_channels=64)

    @staticmethod
    def fast() -> "CraftConfig":
        """Serving preset: half the channels = ~4x less conv FLOPs.
        Trained checkpoint (train/craft.py -> model_zoo/craft-fast-synth)
        matches base recall on the synthetic distribution."""
        return CraftConfig(base_channels=32)

    @staticmethod
    def fast_s2() -> "CraftConfig":
        """fast + space-to-depth stem (model_zoo/craft-s2-synth): the
        /1-resolution conv stage moves to /2 — ~2x forward time — and the
        stride-4 heatmap grid also halves every connected-components
        scan.  Quality vs craft-fast is pinned by check_quality."""
        return CraftConfig(base_channels=32, stem_stride=2)

    @staticmethod
    def fast_s2d2() -> "CraftConfig":
        """s2d stem + sub-pixel (depth-to-space) head: the whole conv
        stack runs one level coarser (~2x fwd, better MXU lane fill) but
        the heatmap still comes out at stride 2 — box framing quality of
        `fast` at close to `fast_s2` speed."""
        return CraftConfig(base_channels=32, stem_stride=2, head_d2s=True)

    @staticmethod
    def fast_s4d4() -> "CraftConfig":
        """4x space-to-depth stem + 4x sub-pixel head: the conv stack
        runs TWO levels coarser than `fast` (stage1 at /4 with 48 input
        channels — MXU-friendly lane fill vs 3), while the 4x4-phase
        depth-to-space head still emits the stride-2 heatmap grid.
        Speed candidate for the serving detector; quality must clear the
        promotion gate like any other checkpoint."""
        return CraftConfig(base_channels=32, stem_stride=4, head_d2s=True)

    @staticmethod
    def tiny() -> "CraftConfig":
        return CraftConfig(base_channels=8)


@dataclasses.dataclass(frozen=True)
class CRNNConfig:
    """CTC recognizer (reference marie/models/icr/model.py four-stage)."""

    num_classes: int = 96  # charset + blank
    input_height: int = 32
    feature_dim: int = 256
    hidden_dim: int = 256
    backbone: str = "resnet"  # vgg | resnet

    @staticmethod
    def tiny() -> "CRNNConfig":
        return CRNNConfig(feature_dim=32, hidden_dim=32, backbone="vgg")


@dataclasses.dataclass(frozen=True)
class LayoutLMConfig:
    """LayoutLMv3-style multimodal encoder
    (reference marie/components/document_classifier/transformers.py)."""

    vocab_size: int = 50265
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_seq_len: int = 512
    max_2d_pos: int = 1024  # coordinate buckets
    image_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    use_image: bool = True
    num_labels: int = 2
    dropout: float = 0.0

    @staticmethod
    def base(num_labels: int = 2) -> "LayoutLMConfig":
        return LayoutLMConfig(num_labels=num_labels)

    @staticmethod
    def synth(num_labels: int) -> "LayoutLMConfig":
        """The in-repo synthetic-trained head config (train/layout.py)."""
        return LayoutLMConfig(
            vocab_size=8192,
            hidden_dim=256,
            num_layers=4,
            num_heads=4,
            mlp_dim=1024,
            max_seq_len=128,
            use_image=False,
            num_labels=num_labels,
        )

    @staticmethod
    def tiny(num_labels: int = 2) -> "LayoutLMConfig":
        return LayoutLMConfig(
            vocab_size=128,
            hidden_dim=64,
            num_layers=2,
            num_heads=2,
            mlp_dim=128,
            max_seq_len=64,
            image_size=(32, 32),
            use_image=True,
            num_labels=num_labels,
        )


@dataclasses.dataclass(frozen=True)
class Pix2PixConfig:
    """Overlay-cleanup generator (reference marie/models/pix2pix resnet_9blocks)."""

    base_channels: int = 64
    num_res_blocks: int = 9
    in_channels: int = 3
    out_channels: int = 3

    @staticmethod
    def synth() -> "Pix2PixConfig":
        """The in-repo synthetic-trained generator (train/overlay.py)."""
        return Pix2PixConfig(base_channels=32, num_res_blocks=6)

    @staticmethod
    def tiny() -> "Pix2PixConfig":
        return Pix2PixConfig(base_channels=8, num_res_blocks=2)


@dataclasses.dataclass(frozen=True)
class BoundaryConfig:
    """Document-boundary corner regressor
    (reference marie/components/document_registration/unilm_dit.py:100 —
    the TPU build regresses the page quad directly instead of running a
    Mask R-CNN; see marie_tpu/models/boundary.py)."""

    input_hw: Tuple[int, int] = (192, 256)
    base_channels: int = 24
    num_stages: int = 5
    mlp_dim: int = 256

    @staticmethod
    def tiny() -> "BoundaryConfig":
        return BoundaryConfig(input_hw=(48, 64), base_channels=8, num_stages=3, mlp_dim=32)
