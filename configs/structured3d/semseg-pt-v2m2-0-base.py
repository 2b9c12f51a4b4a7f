_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]
# PTv2 on Structured3D (reference configs/structured3d/semseg-pt-v2m2-0-base.py)

num_classes = 25
model = dict(num_classes=25)
data = dict(
    num_classes=25,
    train=dict(type="Structured3DDataset", data_root="data/structured3d",
               split=("train", "test")),
    val=dict(type="Structured3DDataset", data_root="data/structured3d", split="val"),
    test=dict(type="Structured3DDataset", data_root="data/structured3d", split="val"),
)
