_base_ = ["./semseg-pt-v2m2-0-base.py"]
# nuScenes lidarseg benchmark submission (reference
# configs/nuscenes/semseg-pt-v2m2-1-benchmark-submit.py)

save_submit = True
data = dict(test=dict(split="test"))
