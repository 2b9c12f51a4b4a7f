_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]
# Concerto-base lin probe on scannetpp (reference configs/concerto/semseg-ptv3-base-v1m1-2a-scannetpp-lin.py)

num_classes = 100
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
