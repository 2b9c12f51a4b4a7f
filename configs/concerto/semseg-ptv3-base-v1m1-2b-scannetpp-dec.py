_base_ = ["../sonata/semseg-sonata-v1m1-0b-scannet-dec.py"]
# Concerto-base dec probe on scannetpp (reference configs/concerto/semseg-ptv3-base-v1m1-2b-scannetpp-dec.py)

num_classes = 100
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
