_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]
# ScanNet++ instance benchmark submission (reference
# configs/scannetpp/insseg-pointgroup-v1m1-1-spunet-submit.py)

save_submit = True
data = dict(test=dict(split="test"))
