_base_ = ["../sonata/semseg-sonata-v1m1-0b-scannet-dec.py"]
# Concerto-base dec probe on scannet (reference configs/concerto/semseg-ptv3-base-v1m1-0b-scannet-dec.py)

num_classes = 20
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(num_classes=20)

