_base_ = ["./semseg-ptv3-large-v1m1-2c-scannetpp-ft.py"]
# LoRA fine-tune on scannetpp (reference
# configs/concerto/semseg-ptv3-large-v1m1-*-scannetpp-ft-lora.py)

model = dict(backbone=dict(lora_rank=16))
optimizer = dict(freeze_all_except=("lora", "seg_head"))
