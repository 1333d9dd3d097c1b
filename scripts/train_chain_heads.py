#!/usr/bin/env python
"""Train the LayoutLM classifier + NER heads for the ON-DEVICE chain
(ocr/fused_chain.py): RollingWordTokenizer ids (device-computable from
recognizer char tokens), shuffled word order (the chain feeds CC-slot
order), max_seq_len = 192 (the chain's per-page row budget).

Saves model_zoo/layout-classifier-chain and model_zoo/layout-indexer-chain.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marie_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from marie_tpu.components.word_tokenizer import RollingWordTokenizer
from marie_tpu.models.configs import LayoutLMConfig
from marie_tpu.train.layout import (
    CLASS_POOLS,
    train_layout_classifier,
    train_layout_indexer,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    cls_cfg = LayoutLMConfig(
        vocab_size=8192, hidden_dim=256, num_layers=4, num_heads=4,
        mlp_dim=1024, max_seq_len=192, use_image=False,
        num_labels=len(CLASS_POOLS),
    )
    _, _, acc, _ = train_layout_classifier(
        config=cls_cfg,
        tokenizer=RollingWordTokenizer(cls_cfg.vocab_size),
        shuffle_words=True,
        steps=2000,
        checkpoint_path=os.path.join(REPO, "model_zoo", "layout-classifier-chain"),
    )
    print(f"classifier-chain held-out acc={acc:.4f}", flush=True)

    ner_cfg = LayoutLMConfig(
        vocab_size=8192, hidden_dim=256, num_layers=4, num_heads=4,
        mlp_dim=1024, max_seq_len=192, use_image=False, num_labels=5,
    )
    _, _, tok_acc, _ = train_layout_indexer(
        config=ner_cfg,
        tokenizer=RollingWordTokenizer(ner_cfg.vocab_size),
        shuffle_words=True,
        steps=2000,
        checkpoint_path=os.path.join(REPO, "model_zoo", "layout-indexer-chain"),
    )
    print(f"indexer-chain held-out token acc={tok_acc:.4f}", flush=True)


if __name__ == "__main__":
    main()
