_base_ = ["./semseg-ptv3-large-v1m1-0c-scannet-ft.py"]
# LoRA fine-tune of the Concerto-large backbone (reference
# configs/concerto/semseg-ptv3-large-v1m1-0f-scannet-ft-lora.py): low-rank
# adapters on attention qkv, everything else frozen.

model = dict(backbone=dict(lora_rank=16))
optimizer = dict(freeze_all_except=("lora", "seg_head"))
