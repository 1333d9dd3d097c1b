"""HuggingFace-transformers text embeddings (torch CPU backend).

Counterpart of the reference's ``TransformersEmbeddings``
(``/root/reference/marie/embeddings/transformers/transformers_embeddings.py:16``):
any HF encoder checkpoint, attention-mask mean pooling, L2
normalization.  torch + transformers ship in this environment; only the
model weights are deployment-supplied (``model_name_or_path`` may be a
hub id or a local directory) — the backend is exercised in tests with a
tiny locally-constructed checkpoint.
"""

from typing import Optional, Sequence

import numpy as np

from marie_tpu.embeddings.base import EmbeddingsBase


class TransformersEmbeddings(EmbeddingsBase):
    def __init__(
        self,
        model_name_or_path: str,
        batch_size: int = 16,
        max_length: int = 256,
        device: str = "cpu",
        normalize: bool = True,
        tokenizer: Optional[object] = None,
        model: Optional[object] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.batch_size = batch_size
        self.max_length = max_length
        self.device = device
        self.normalize = normalize
        if model is None or tokenizer is None:
            try:
                from transformers import AutoModel, AutoTokenizer
            except ImportError as ex:  # pragma: no cover
                raise RuntimeError(
                    "TransformersEmbeddings needs the transformers package"
                ) from ex

            tokenizer = tokenizer or AutoTokenizer.from_pretrained(
                model_name_or_path
            )
            model = model or AutoModel.from_pretrained(model_name_or_path)
        self.tokenizer = tokenizer
        self.model = model.to(device).eval()

    def get_embeddings(self, texts: Sequence[str], **kwargs) -> np.ndarray:
        import torch

        vecs = []
        for i in range(0, len(texts), self.batch_size):
            batch = list(texts[i : i + self.batch_size])
            enc = self.tokenizer(
                batch,
                padding=True,
                truncation=True,
                max_length=self.max_length,
                return_tensors="pt",
            ).to(self.device)
            with torch.no_grad():
                out = self.model(**enc)
            hidden = out.last_hidden_state  # [B, L, D]
            mask = enc["attention_mask"].unsqueeze(-1).float()
            pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1.0)
            vecs.append(pooled.cpu().numpy().astype(np.float32))
        out_np = np.concatenate(vecs, axis=0)
        if self.normalize:
            norms = np.linalg.norm(out_np, axis=1, keepdims=True)
            out_np = out_np / np.maximum(norms, 1e-9)
        return out_np
