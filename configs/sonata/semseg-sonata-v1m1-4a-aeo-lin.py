_base_ = ["./semseg-sonata-v1m1-0a-scannet-lin.py"]
# Sonata linear probe on AEO (reference
# configs/sonata/semseg-sonata-v1m1-4a-aeo-lin.py)

num_classes = 38
model = dict(num_classes=38)
data = dict(
    num_classes=38,
    train=dict(type="AEODataset", data_root="data/aeo"),
    val=dict(type="AEODataset", data_root="data/aeo"),
    test=dict(type="AEODataset", data_root="data/aeo"),
)
