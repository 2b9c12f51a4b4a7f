_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata fine-tune under limited annotations (200 pts/scene; reference
# configs/sonata/semseg-sonata-v1m1-0e*-scannet-ft-la200.py)

data = dict(train=dict(la_file="data/scannet/tasks/points/points200.npy"))
