_base_ = ["../scannet/insseg-pointgroup-v1m2-0-ptv3-base.py"]
# PointGroup/PTv3 on ScanNet++ (reference
# configs/scannetpp/insseg-pointgroup-v1m2-0-ptv3-base.py)

num_classes = 100
model = dict(
    semantic_num_classes=100,
    segment_ignore_index=(-1, 0, 1),
)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
