_base_ = ["./semseg-pt-v2m2-0-base.py"]
# ScanNet++ top-3 benchmark submission (reference
# configs/scannetpp/semseg-pt-v2m2-2-submit.py)

save_submit = True
data = dict(test=dict(split="test"))
