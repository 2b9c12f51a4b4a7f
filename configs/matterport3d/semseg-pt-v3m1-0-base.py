_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]
# PTv3 on Matterport3D (reference configs/matterport3d/semseg-pt-v3m1-0-base.py)

num_classes = 21
model = dict(num_classes=21)
data = dict(
    num_classes=21,
    train=dict(type="Matterport3DDataset", data_root="data/matterport3d"),
    val=dict(type="Matterport3DDataset", data_root="data/matterport3d"),
    test=dict(type="Matterport3DDataset", data_root="data/matterport3d"),
)
