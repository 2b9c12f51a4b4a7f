_base_ = ["./semseg-ptv3-large-v1m1-1c-scannet200-ft.py"]
# LoRA fine-tune on scannet200 (reference
# configs/concerto/semseg-ptv3-large-v1m1-*-scannet200-ft-lora.py)

model = dict(backbone=dict(lora_rank=16))
optimizer = dict(freeze_all_except=("lora", "seg_head"))
