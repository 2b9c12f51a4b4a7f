_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata + PPT-style multi-dataset head fine-tune (reference
# configs/sonata/semseg-sonata-v1m1-0d-scannet-ppt.py): PDNorm conditions in
# the backbone while fine-tuning from the SSL checkpoint.

model = dict(backbone=dict(pdnorm_conditions=2))
