_base_ = ["./semseg-pt-v3m1-0-base.py"]
# ScanNet++ top-3 benchmark submission (reference
# configs/scannetpp/semseg-pt-v3m1-1-submit.py)

save_submit = True
data = dict(test=dict(split="test"))
