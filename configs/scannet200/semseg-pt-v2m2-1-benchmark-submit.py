_base_ = ["./semseg-pt-v2m2-0-base.py"]
# ScanNet200 benchmark submission (reference
# configs/scannet200/semseg-pt-v2m2-1-benchmark-submit.py)

save_submit = True
data = dict(test=dict(split="test"))
