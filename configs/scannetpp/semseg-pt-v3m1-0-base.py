_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]
# PTv3 semseg on ScanNet++ (recipe parity: reference
# configs/scannetpp/semseg-pt-v3m1-0-base.py — 100 classes, top-3 submission
# handled by the SemSegTester's ScanNet++ writer)

num_classes = 100

model = dict(
    num_classes=100,
)

data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
