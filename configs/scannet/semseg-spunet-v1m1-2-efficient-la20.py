_base_ = ["./semseg-spunet-v1m1-0-base.py"]
# Data-efficient ScanNet: limited annotations (20 labeled points per scene;
# reference configs/scannet/semseg-spunet-v1m1-2-efficient-la20.py)

data = dict(
    train=dict(la_file="data/scannet/tasks/points/points20.npy"),
)
