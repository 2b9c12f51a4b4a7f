_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]
# Linear probe of a Concerto-pretrained encoder on ScanNet (reference
# configs/concerto/semseg-ptv3-base-v1m1-0a-scannet-lin.py)

weight = "exp/concerto/pretrain/model/model_best.ckpt"
