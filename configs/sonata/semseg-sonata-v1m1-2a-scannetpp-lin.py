_base_ = ["./semseg-sonata-v1m1-0a-scannet-lin.py"]
# Sonata lin probe on scannetpp (reference configs/sonata/semseg-sonata-v1m1-2a-scannetpp-lin.py)

num_classes = 100
model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
