_base_ = ["../scannet/semseg-swin3d-v1m1-0-small.py"]
# Swin3D-S on Structured3D (reference
# configs/structured3d/semseg-swin3d-v1m1-0-small.py)

num_classes = 25
model = dict(num_classes=25)
data = dict(
    num_classes=25,
    train=dict(type="Structured3DDataset", data_root="data/structured3d",
               split=("train", "test")),
    val=dict(type="Structured3DDataset", data_root="data/structured3d", split="val"),
    test=dict(type="Structured3DDataset", data_root="data/structured3d", split="val"),
)
