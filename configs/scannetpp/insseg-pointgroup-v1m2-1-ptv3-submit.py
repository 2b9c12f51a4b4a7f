_base_ = ["./insseg-pointgroup-v1m2-0-ptv3-base.py"]
# ScanNet++ instance submission with the PTv3 backbone (reference
# configs/scannetpp/insseg-pointgroup-v1m2-1-ptv3-submit.py)

save_submit = True
data = dict(test=dict(split="test"))
