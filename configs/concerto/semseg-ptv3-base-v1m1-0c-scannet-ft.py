_base_ = ["../sonata/semseg-sonata-v1m1-0c-scannet-ft.py"]
# Full fine-tune from Concerto pretraining (reference
# configs/concerto/semseg-ptv3-base-v1m1-0c-scannet-ft.py)

weight = "exp/concerto/pretrain/model/model_best.ckpt"
