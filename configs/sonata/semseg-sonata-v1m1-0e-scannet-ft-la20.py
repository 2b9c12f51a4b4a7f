_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata fine-tune under limited annotations (20 pts/scene; reference
# configs/sonata/semseg-sonata-v1m1-0e*-scannet-ft-la20.py)

data = dict(train=dict(la_file="data/scannet/tasks/points/points20.npy"))
