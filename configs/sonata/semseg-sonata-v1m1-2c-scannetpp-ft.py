_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata ft probe on scannetpp (reference configs/sonata/semseg-sonata-v1m1-2c-scannetpp-ft.py)

num_classes = 100
model = dict(num_classes=100)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
