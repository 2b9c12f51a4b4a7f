_base_ = ["./semseg-sonata-v1m1-0b-scannet-dec.py"]
# Full fine-tune from Sonata pretraining (reference
# configs/sonata/semseg-sonata-v1m1-0c-scannet-ft.py)

optimizer = dict(freeze_all_except=None)
