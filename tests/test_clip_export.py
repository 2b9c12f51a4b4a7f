"""tools/export_clip_class_embeddings.py — offline CLIP table export.

Builds a tiny randomly-initialized CLIP text tower, saves it as a local
checkpoint, and runs the export path against it (no network; exercises the
same ``CLIPTextModelWithProjection`` code path a real ViT-B/16 checkpoint
would take, per the reference's
`point_prompt_training_v1m1_language_guided.py:61-77`).
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip_checkpoint(tmp_path_factory):
    import json

    from transformers import CLIPTextConfig, CLIPTextModelWithProjection, CLIPTokenizer

    path = tmp_path_factory.mktemp("tiny_clip")
    # minimal character-level BPE vocabulary (CLIP format: word-final tokens
    # carry "</w>"; specials bracket every sequence)
    chars = "abcdefghijklmnopqrstuvwxyz"
    vocab = {}
    for ch in chars:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (path / "vocab.json").write_text(json.dumps(vocab))
    (path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(path / "vocab.json"), str(path / "merges.txt"))
    tok.save_pretrained(path)

    cfg = CLIPTextConfig(
        vocab_size=len(vocab),
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=77,
        projection_dim=16,
        bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"],
    )
    model = CLIPTextModelWithProjection(cfg)
    model.save_pretrained(path)
    return str(path)


def test_export_table_shape_and_determinism(tiny_clip_checkpoint):
    from tools.export_clip_class_embeddings import encode_class_names

    names = ["wall", "floor", "chair"]
    t1 = encode_class_names(tiny_clip_checkpoint, names, template="a photo of a [x]")
    t2 = encode_class_names(tiny_clip_checkpoint, names, template="a photo of a [x]")
    assert t1.shape == (3, 16) and t1.dtype == np.float32
    np.testing.assert_array_equal(t1, t2)
    # different prompts give different rows
    assert not np.allclose(t1[0], t1[1])


def test_normalize_flag(tiny_clip_checkpoint):
    from tools.export_clip_class_embeddings import encode_class_names

    t = encode_class_names(tiny_clip_checkpoint, ["a", "b"], normalize=True)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
