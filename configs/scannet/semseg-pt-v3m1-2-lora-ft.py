_base_ = ["./semseg-pt-v3m1-0-base.py"]
# LoRA fine-tuning of a pretrained PTv3 (capability parity:
# `pointcept/models/default.py:98-204` DefaultLORASegmentorV2 — low-rank
# adapters on every attention qkv with the backbone frozen).
# TPU design: LoRA lives inside the backbone (`lora_rank`), and freezing is an
# optimizer property (`freeze_all_except` zeroes every update whose path lacks
# the keyword), not a parameter-surgery wrapper.

model = dict(
    backbone=dict(
        lora_rank=16,
    ),
)

weight = "exp/scannet/pretrain/model/model_best.ckpt"  # backbone init
optimizer = dict(freeze_all_except="lora")
eval_epoch = 50
