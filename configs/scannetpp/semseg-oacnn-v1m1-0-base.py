_base_ = ["../scannet/semseg-oacnns-v1m1-0-base.py"]
# OA-CNNs on ScanNet++ (reference configs/scannetpp/semseg-oacnn-v1m1-0-base.py)

num_classes = 100
model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
