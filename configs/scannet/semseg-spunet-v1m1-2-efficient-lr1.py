_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Data-efficient ScanNet: limited reconstructions (1% of scenes;
# reference configs/scannet/semseg-spunet-v1m1-2-efficient-lr1.py)

data = dict(
    train=dict(lr_file="data/scannet/tasks/scenes/scene1.txt"),
)
