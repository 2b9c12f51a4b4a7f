_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Data-efficient ScanNet: limited reconstructions (20% of scenes;
# reference configs/scannet/semseg-spunet-v1m1-2-efficient-lr20.py)

data = dict(
    train=dict(lr_file="data/scannet/tasks/scenes/scene20.txt"),
)
