_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]
# Sonata fine-tune under limited reconstructions (20% scenes; reference
# configs/sonata/semseg-sonata-v1m1-0e*-scannet-ft-lr20.py)

data = dict(train=dict(lr_file="data/scannet/tasks/scenes/scene20.txt"))
