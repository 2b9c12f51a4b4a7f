_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]
# Concerto-large lin probe on scannetpp (reference configs/concerto/semseg-ptv3-large-v1m1-2a-scannetpp-lin.py)

num_classes = 100
weight = "exp/concerto/pretrain/model/model_best.ckpt"
model = dict(
    num_classes=100,
    backbone=dict(
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
    ),
    backbone_out_channels=48 + 96 + 192 + 384 + 512,
)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
