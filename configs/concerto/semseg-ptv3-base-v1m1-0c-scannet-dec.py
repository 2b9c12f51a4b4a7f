_base_ = ["../sonata/semseg-sonata-v1m1-0b-scannet-dec.py"]
# Decoder probe from Concerto pretraining (reference
# configs/concerto/semseg-ptv3-base-v1m1-0c-scannet-dec.py)

weight = "exp/concerto/pretrain/model/model_best.ckpt"
