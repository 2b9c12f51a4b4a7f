_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata fine-tune under limited reconstructions (10% scenes; reference
# configs/sonata/semseg-sonata-v1m1-0e*-scannet-ft-lr10.py)

data = dict(train=dict(lr_file="data/scannet/tasks/scenes/scene10.txt"))
