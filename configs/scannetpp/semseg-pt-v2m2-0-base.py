_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]
# PTv2 on ScanNet++ (reference configs/scannetpp/semseg-pt-v2m2-0-base.py)

num_classes = 100
model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
