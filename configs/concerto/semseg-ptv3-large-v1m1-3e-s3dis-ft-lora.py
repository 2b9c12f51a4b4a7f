_base_ = ["./semseg-ptv3-large-v1m1-3c-s3dis-ft.py"]
# LoRA fine-tune on s3dis (reference
# configs/concerto/semseg-ptv3-large-v1m1-*-s3dis-ft-lora.py)

model = dict(backbone=dict(lora_rank=16))
optimizer = dict(freeze_all_except=("lora", "seg_head"))
