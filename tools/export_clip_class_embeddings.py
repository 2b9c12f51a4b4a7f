"""Export a frozen CLIP text-embedding table for language-guided PPT.

The reference embeds the unified class vocabulary with a frozen CLIP text
encoder at model init (`point_prompt_training_v1m1_language_guided.py:61-77`:
``template="[x]"``, ``clip_model="ViT-B/16"``, ``encode_text`` of the
templated class names).  The TPU framework keeps the encoder out of the
training graph instead: this tool runs the text encoder ONCE offline and
writes a ``[num_names, embed_dim]`` float32 ``.npy`` that
``LanguageGuidedPPT(class_embedding_path=...)`` loads as a frozen table —
same alignment semantics, no torch/CLIP dependency at train time.

Uses the baked-in ``transformers`` CLIP implementation.  Pass a local
checkpoint directory (no network egress in this environment); any
``CLIPTextModelWithProjection``-compatible checkpoint works, e.g. a local
clone of ``openai/clip-vit-base-patch16`` (the reference's ViT-B/16).

Usage:
  python tools/export_clip_class_embeddings.py \
      --checkpoint /path/to/clip-vit-base-patch16 \
      --class-names wall floor cabinet bed chair ... \
      --template "[x]" \
      --out exp/class_embeddings.npy
  # or take the vocabulary from a config's model.class_name:
  python tools/export_clip_class_embeddings.py \
      --checkpoint ... --config configs/scannet/semseg-ppt-v1m1-0-sc-st-spunet.py \
      --out exp/class_embeddings.npy
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def encode_class_names(checkpoint, class_names, template="[x]", normalize=False):
    """Return [len(class_names), embed_dim] float32 CLIP text embeddings."""
    import torch
    from transformers import AutoTokenizer, CLIPTextModelWithProjection

    tokenizer = AutoTokenizer.from_pretrained(checkpoint)
    model = CLIPTextModelWithProjection.from_pretrained(checkpoint)
    model.eval()
    prompts = [template.replace("[x]", str(n)) for n in class_names]
    with torch.no_grad():
        # truncation: CLIP's text tower has a fixed 77-token context; an
        # over-long prompt would otherwise crash in the position embeddings
        # (reference clip.tokenize enforces the same cap)
        max_len = getattr(tokenizer, "model_max_length", 77)
        if not isinstance(max_len, int) or max_len > 10**6:
            # unset tokenizers report a huge sentinel (int(1e30)) that
            # overflows enable_truncation; fall back to CLIP's 77 context
            max_len = 77
        tokens = tokenizer(
            prompts,
            padding=True,
            truncation=True,
            max_length=max_len,
            return_tensors="pt",
        )
        embeds = model(**tokens).text_embeds.float()
        if normalize:
            embeds = embeds / embeds.norm(dim=-1, keepdim=True)
    return embeds.cpu().numpy().astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="local CLIP checkpoint dir")
    ap.add_argument("--class-names", nargs="*", default=None)
    ap.add_argument("--config", default=None, help="read model.class_name from a config")
    ap.add_argument("--template", default="[x]", help="prompt template, [x] = class name")
    ap.add_argument("--normalize", action="store_true", help="L2-normalize rows")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    names = args.class_names
    if not names and args.config:
        from pointcept_keypointdetection_tpu.utils.config import Config

        names = list(Config.fromfile(args.config).model.get("class_name", ()))
    if not names:
        ap.error("provide --class-names or a --config whose model has class_name")

    table = encode_class_names(args.checkpoint, names, args.template, args.normalize)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.save(args.out, table)
    print(f"wrote {args.out}: {table.shape} ({len(names)} classes)")


if __name__ == "__main__":
    main()
