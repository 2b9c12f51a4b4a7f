_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata fine-tune under limited annotations (100 pts/scene; reference
# configs/sonata/semseg-sonata-v1m1-0e*-scannet-ft-la100.py)

data = dict(train=dict(la_file="data/scannet/tasks/points/points100.npy"))
