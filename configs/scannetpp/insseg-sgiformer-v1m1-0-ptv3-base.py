_base_ = ["../scannet/insseg-sgiformer-v1m1-0-spunet-base.py"]
# SGIFormer with PTv3 backbone on ScanNet++ (reference
# configs/scannetpp/insseg-sgiformer-v1m1-0-ptv3-base.py)

num_classes = 100
model = dict(
    backbone=dict(
        _delete_=True,
        type="PT-v3m1",
        in_channels=6,
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(128, 128, 128, 128),
        drop_path=0.3,
        slot_divisors=(1, 4, 16, 32, 64),
    ),
    num_classes=100,
)
data = dict(
    num_classes=100,
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
